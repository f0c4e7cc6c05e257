"""Debug visualization: gradient quivers, point-cloud scatters, render grids.

Reference: DSS/misc/visualize.py — plot_2D_quiver (432-589, NDC-projected
points + negative-gradient arrows over the GT mask, grouped by gradient
source), plot_3D_quiver (234-430), animate_points (23-232).  The reference
uses plotly HTML; this environment ships matplotlib, so figures are saved as
PNGs (same information: per-source gradient fields over the image).  All
functions are host-side — call them on fetched numpy arrays.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def ndc_to_pixel_np(xy: np.ndarray, image_size: int) -> np.ndarray:
    """NDC xy → pixel (col, row) under the flipped +X-left/+Y-up convention."""
    s = image_size
    col = (s * (1.0 - xy[..., 0]) - 1.0) * 0.5
    row = (s * (1.0 - xy[..., 1]) - 1.0) * 0.5
    return np.stack([col, row], axis=-1)


def plot_2d_quiver(
    pts_ndc: np.ndarray,
    grads_ndc: Dict[str, np.ndarray],
    mask_img: Optional[np.ndarray],
    path: str,
    image_size: int = 256,
    n_arrows: int = 400,
) -> str:
    """Negative-gradient arrows at projected point locations over the GT mask
    (reference plot_2D_quiver, visualize.py:432-589)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(7, 7))
    if mask_img is not None:
        ax.imshow(np.asarray(mask_img), cmap="gray", alpha=0.6)
    pix = ndc_to_pixel_np(np.asarray(pts_ndc)[:, :2], image_size)
    step = max(1, len(pix) // n_arrows)
    colors = ["tab:red", "tab:blue", "tab:green", "tab:orange", "tab:purple"]
    for i, (name, g) in enumerate(grads_ndc.items()):
        gp = ndc_to_pixel_np(-np.asarray(g)[:, :2] + np.asarray(pts_ndc)[:, :2], image_size) - pix
        ax.quiver(
            pix[::step, 0], pix[::step, 1], gp[::step, 0], gp[::step, 1],
            angles="xy", scale_units="xy", scale=1.0,
            color=colors[i % len(colors)], width=0.002, label=name,
        )
    ax.scatter(pix[::step, 0], pix[::step, 1], s=1, c="k")
    ax.set_xlim(0, image_size)
    ax.set_ylim(image_size, 0)
    ax.legend()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_3d_quiver(
    pts_world: np.ndarray,
    grads_world: Dict[str, np.ndarray],
    path: str,
    n_arrows: int = 300,
) -> str:
    """World-space gradient cones (reference plot_3D_quiver,
    visualize.py:234-430) as a matplotlib 3D quiver."""
    plt = _mpl()
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    p = np.asarray(pts_world)
    step = max(1, len(p) // n_arrows)
    colors = ["tab:red", "tab:blue", "tab:green", "tab:orange"]
    ax.scatter(p[::step, 0], p[::step, 1], p[::step, 2], s=1, c="k")
    for i, (name, g) in enumerate(grads_world.items()):
        g = -np.asarray(g)
        scale = 0.2 / max(np.abs(g).max(), 1e-12)
        ax.quiver(
            p[::step, 0], p[::step, 1], p[::step, 2],
            g[::step, 0] * scale, g[::step, 1] * scale, g[::step, 2] * scale,
            color=colors[i % len(colors)], label=name, linewidth=0.5,
        )
    ax.legend()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def save_image_grid(images: np.ndarray, path: str, ncols: int = 4) -> str:
    """Rendered view batch (V, H, W, C) → one PNG grid (reference visualize
    logging, trainer.py:378-440)."""
    plt = _mpl()
    images = np.asarray(images)
    v = images.shape[0]
    ncols = min(ncols, v)
    nrows = (v + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 3 * nrows), squeeze=False)
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        ax.axis("off")
        if i < v:
            im = np.clip(images[i], 0.0, 1.0)
            if im.shape[-1] == 1:
                ax.imshow(im[..., 0], cmap="gray")
            else:
                ax.imshow(im[..., :3])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_iso_surface(
    sdf_fn, path: str, bound: float = 1.2, resolution: int = 48, level: float = 0.0
) -> str:
    """Mesh the SDF level set (marching tetrahedra) and render a 3D preview
    (reference plot_iso_surface, visualize.py:617)."""
    import jax.numpy as jnp

    from dss_tpu.geometry.meshing import marching_tetrahedra

    lin = np.linspace(-bound, bound, resolution)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    sdf = np.asarray(sdf_fn(jnp.asarray(grid))).reshape(resolution, resolution, resolution)
    verts, faces = marching_tetrahedra(sdf, np.full(3, -bound), np.full(3, bound), level)

    plt = _mpl()
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    if len(faces):
        tri = verts[faces]
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        coll = Poly3DCollection(tri[:: max(1, len(tri) // 4000)], alpha=0.6)
        coll.set_edgecolor("none")
        ax.add_collection3d(coll)
        ax.set_xlim(-bound, bound); ax.set_ylim(-bound, bound); ax.set_zlim(-bound, bound)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_cuts(sdf_fn, path: str, bound: float = 1.2, resolution: int = 96) -> str:
    """Axis-aligned SDF cross-sections with the zero level set highlighted
    (reference plot_cuts, visualize.py:668)."""
    import jax.numpy as jnp

    plt = _mpl()
    lin = np.linspace(-bound, bound, resolution)
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    for axis, ax in enumerate(axes):
        a, b = np.meshgrid(lin, lin, indexing="ij")
        pts = np.zeros((resolution * resolution, 3), np.float32)
        other = [i for i in range(3) if i != axis]
        pts[:, other[0]] = a.reshape(-1)
        pts[:, other[1]] = b.reshape(-1)
        f = np.asarray(sdf_fn(jnp.asarray(pts))).reshape(resolution, resolution)
        im = ax.contourf(lin, lin, f.T, levels=20, cmap="RdBu")
        ax.contour(lin, lin, f.T, levels=[0.0], colors="k", linewidths=2)
        ax.set_title(f"cut {'xyz'[axis]} = 0")
        fig.colorbar(im, ax=ax)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


# ---------------------------------------------------------------------------
# Animations + HTML reports (reference visualize.py:23-232 animate_points /
# animate_mesh and :590 figures_to_html).  The reference renders these with
# plotly; this environment has no plotly, so the HTML viewer is a
# self-contained inline-JS canvas renderer (drag to rotate, slider to step —
# the same interactions the reference's plotly slider figures provide) and
# the GIF path uses matplotlib + imageio.
# ---------------------------------------------------------------------------

_HTML_PLAYER = """<!DOCTYPE html><html><head><meta charset="utf-8">
<style>body{font-family:sans-serif;margin:10px;background:#111;color:#eee}
canvas{background:#181818;border:1px solid #333;touch-action:none}
#bar{margin:8px 0}input[type=range]{width:420px;vertical-align:middle}
</style></head><body>
<div id="title">__TITLE__</div>
<canvas id="c" width="720" height="640"></canvas>
<div id="bar"><input id="s" type="range" min="0" max="__MAXF__" value="0" step="1">
<span id="lab"></span></div>
<script>
const FRAMES = __DATA__;          // [{name, pts: [x,y,z,...] flat}]
const cv = document.getElementById('c'), ctx = cv.getContext('2d');
const sl = document.getElementById('s'), lab = document.getElementById('lab');
let rx = -0.5, ry = 0.6, scale = 0.42*Math.min(cv.width, cv.height), fi = 0;
function draw(){
  const f = FRAMES[fi]; lab.textContent = f.name;
  ctx.clearRect(0,0,cv.width,cv.height);
  const cx=Math.cos(rx),sx=Math.sin(rx),cy=Math.cos(ry),sy=Math.sin(ry);
  const p = f.pts, n = p.length/3, ox = cv.width/2, oy = cv.height/2;
  // depth-sorted splats, shaded by depth
  const order = new Array(n); const zz = new Float32Array(n);
  const xx = new Float32Array(n), yy = new Float32Array(n);
  for(let i=0;i<n;i++){
    let X=p[3*i],Y=p[3*i+1],Z=p[3*i+2];
    let x1 =  cy*X + sy*Z, z1 = -sy*X + cy*Z;          // yaw
    let y2 =  cx*Y - sx*z1, z2 = sx*Y + cx*z1;          // pitch
    xx[i]=x1; yy[i]=y2; zz[i]=z2; order[i]=i;
  }
  order.sort((a,b)=>zz[a]-zz[b]);
  for(const i of order){
    const t = Math.max(0, Math.min(1, 0.5 + zz[i]));
    const c = Math.round(90 + 150*t);
    ctx.fillStyle = `rgb(${c},${Math.round(0.75*c)},${Math.round(120-40*t)})`;
    ctx.fillRect(ox + scale*xx[i], oy - scale*yy[i], 2.2, 2.2);
  }
}
let drag=false, lx=0, ly=0;
cv.addEventListener('pointerdown',e=>{drag=true;lx=e.clientX;ly=e.clientY});
window.addEventListener('pointerup',()=>drag=false);
window.addEventListener('pointermove',e=>{ if(!drag)return;
  ry += (e.clientX-lx)*0.01; rx += (e.clientY-ly)*0.01; lx=e.clientX; ly=e.clientY; draw();});
cv.addEventListener('wheel',e=>{e.preventDefault(); scale*=e.deltaY<0?1.1:0.9; draw();});
sl.addEventListener('input',()=>{fi=+sl.value; draw();});
draw();
</script></body></html>
"""


def _normalize_frames(frames):
    """Center/scale all frames jointly into [-0.5, 0.5]^3 for the viewer."""
    allp = np.concatenate([np.asarray(f, np.float32) for f in frames], axis=0)
    lo, hi = allp.min(0), allp.max(0)
    center = (lo + hi) / 2.0
    scale = max(float((hi - lo).max()), 1e-9)
    return [(np.asarray(f, np.float32) - center) / scale for f in frames]


def animate_points(
    frames,
    names=None,
    save_html: Optional[str] = None,
    save_gif: Optional[str] = None,
    max_points: int = 4000,
    title: str = "point-cloud animation",
) -> Optional[str]:
    """Step-slider animation over a sequence of point clouds (reference
    animate_points, visualize.py:23-121).

    frames: list of (P_i, 3) arrays or .ply paths; names: per-frame labels.
    save_html → interactive viewer (drag = rotate, wheel = zoom, slider =
    step); save_gif → turntable-free frame-by-frame GIF via matplotlib.
    """
    import json

    loaded = []
    for f in frames:
        if isinstance(f, (str, bytes, os.PathLike)):
            from dss_tpu.data.io import read_ply

            loaded.append(read_ply(os.fspath(f)).points)
        else:
            loaded.append(np.asarray(f, np.float32))
    if names is None:
        names = [str(i) for i in range(len(loaded))]
    rng = np.random.default_rng(0)
    dec = []
    for f in loaded:
        if f.shape[0] > max_points:
            f = f[rng.choice(f.shape[0], max_points, replace=False)]
        dec.append(f)
    dec = _normalize_frames(dec)

    out = None
    if save_html:
        data = [
            {"name": str(n), "pts": [round(float(v), 4) for v in f.reshape(-1)]}
            for n, f in zip(names, dec)
        ]
        html = (
            _HTML_PLAYER.replace("__DATA__", json.dumps(data))
            .replace("__MAXF__", str(len(dec) - 1))
            .replace("__TITLE__", title)
        )
        os.makedirs(os.path.dirname(os.path.abspath(save_html)), exist_ok=True)
        with open(save_html, "w") as fh:
            fh.write(html)
        out = save_html
    if save_gif:
        import imageio.v2 as imageio

        plt = _mpl()
        images = []
        for n, f in zip(names, dec):
            fig = plt.figure(figsize=(5, 5))
            ax = fig.add_subplot(111, projection="3d")
            ax.scatter(f[:, 0], f[:, 2], f[:, 1], s=1.5, c=f[:, 2], cmap="viridis")
            ax.set_title(str(n))
            ax.set_xlim(-0.55, 0.55); ax.set_ylim(-0.55, 0.55); ax.set_zlim(-0.55, 0.55)
            ax.set_axis_off()
            fig.canvas.draw()
            w, h = fig.canvas.get_width_height()
            img = np.frombuffer(fig.canvas.buffer_rgba(), np.uint8).reshape(h, w, 4)
            images.append(img[..., :3].copy())
            plt.close(fig)
        os.makedirs(os.path.dirname(os.path.abspath(save_gif)), exist_ok=True)
        imageio.mimsave(save_gif, images, duration=0.5, loop=0)
        out = out or save_gif
    return out


def animate_mesh(
    verts_frames,
    faces,
    names=None,
    save_html: Optional[str] = None,
    save_gif: Optional[str] = None,
) -> Optional[str]:
    """Mesh-sequence animation (reference animate_mesh, visualize.py:124-232):
    renders each frame's vertex set through the same viewer (vertices +
    face-subsampled surface points so the surface reads as filled)."""
    faces = np.asarray(faces)
    frames = []
    for v in verts_frames:
        v = np.asarray(v, np.float32)
        centers = v[faces].mean(axis=1)
        frames.append(np.concatenate([v, centers], axis=0))
    return animate_points(
        frames, names=names, save_html=save_html, save_gif=save_gif,
        title="mesh animation",
    )


def figures_to_html(figs, filename: str) -> str:
    """Single-file HTML dashboard of matplotlib figures (reference
    figures_to_html, visualize.py:590-612 — plotly divs there, base64-PNG
    <img> blocks here)."""
    import base64
    import io

    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as dash:
        dash.write("<html><head></head><body>\n")
        for fig in figs:
            buf = io.BytesIO()
            fig.savefig(buf, format="png", dpi=100, bbox_inches="tight")
            b64 = base64.b64encode(buf.getvalue()).decode("ascii")
            dash.write(f'<img src="data:image/png;base64,{b64}"/>\n')
        dash.write("</body></html>\n")
    return filename
