"""Visualization artifacts: animations (HTML + GIF) and HTML figure reports
(reference visualize.py:23-232 animate_points/animate_mesh, :590
figures_to_html — rebuilt without plotly: inline-JS canvas viewer + base64
matplotlib dashboard)."""
import json
import os
import re

import numpy as np

from dss_tpu.utils.visualize import (
    animate_mesh,
    animate_points,
    figures_to_html,
)
from tests.test_render import fibonacci_sphere


def test_animate_points_html_and_gif(tmp_path):
    frames = [
        fibonacci_sphere(300, 0.5 + 0.1 * i) + np.array([0.01 * i, 0, 0])
        for i in range(4)
    ]
    html = str(tmp_path / "anim.html")
    gif = str(tmp_path / "anim.gif")
    animate_points(
        frames, names=[f"it {i}" for i in range(4)],
        save_html=html, save_gif=gif,
    )
    text = open(html).read()
    m = re.search(r"const FRAMES = (\[.*?\]);", text, re.S)
    assert m, "FRAMES payload missing"
    data = json.loads(m.group(1))
    assert len(data) == 4 and data[2]["name"] == "it 2"
    assert len(data[0]["pts"]) == 300 * 3
    # jointly normalized into the viewer box
    allp = np.array([d["pts"] for d in data]).reshape(-1)
    assert np.abs(allp).max() <= 0.501
    assert os.path.getsize(gif) > 1000  # a real multi-frame gif
    import imageio.v2 as imageio

    assert len(imageio.mimread(gif)) == 4


def test_animate_points_accepts_ply_paths(tmp_path):
    from dss_tpu.data.io import save_ply

    p1 = str(tmp_path / "a.ply")
    p2 = str(tmp_path / "b.ply")
    save_ply(p1, fibonacci_sphere(100, 1.0))
    save_ply(p2, fibonacci_sphere(100, 1.2))
    html = str(tmp_path / "anim.html")
    animate_points([p1, p2], save_html=html)
    assert os.path.exists(html)


def test_animate_mesh(tmp_path):
    from dss_tpu.geometry.shapes import ico_sphere

    verts, faces = ico_sphere(level=1, radius=1.0)
    html = str(tmp_path / "mesh.html")
    animate_mesh(
        [np.asarray(verts), np.asarray(verts) * 1.1], np.asarray(faces),
        save_html=html,
    )
    text = open(html).read()
    data = json.loads(re.search(r"const FRAMES = (\[.*?\]);", text, re.S).group(1))
    assert len(data) == 2
    # vertices + one point per face
    assert len(data[0]["pts"]) // 3 == verts.shape[0] + faces.shape[0]


def test_figures_to_html(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    figs = []
    for i in range(3):
        f = plt.figure()
        plt.plot(np.arange(10), np.arange(10) ** (i + 1))
        figs.append(f)
    out = str(tmp_path / "report.html")
    figures_to_html(figs, out)
    text = open(out).read()
    assert text.count("data:image/png;base64,") == 3
    for f in figs:
        plt.close(f)
