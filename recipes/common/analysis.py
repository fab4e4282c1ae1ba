"""Detection analysis: stats, an 8-plot analysis suite, and an animated
timeline video.

Covers the analysis surface of the reference's content-moderation recipe —
visualization.py:7-96 (static timeline plot), app.py:119-369
`create_visualization_plots` (8 matplotlib analysis plots + stats text),
and video_visualization.py:64-199 (a rendered video of the detection
timeline with a moving playhead). The reference renders one matplotlib
figure PER OUTPUT FRAME and shells out to ffmpeg; here the chart is
rasterized twice (dim/bright), and each video frame is a numpy composite
(bright curve left of the playhead, dim right) — two figure renders total
instead of thousands, and the mp4 goes through the shared cv2 VideoSink.

All functions take either a loaded detection dict or a JSON path, in the
recipes' persistence schema ({"detections": {frame: [[x0,y0,x1,y1], ...]},
"video_metadata": {...}} — metadata optional for backward compatibility).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .persistence import load_detection_data

DataOrPath = Union[Dict[str, Any], str]


def _load(data: DataOrPath) -> Dict[str, Any]:
    if isinstance(data, str):
        return load_detection_data(data)
    return data


def flatten_detections(data: DataOrPath) -> Dict[str, Any]:
    """Tabulate the per-frame detection dict into flat numpy columns
    (the role of the reference's pandas DataFrame build,
    app.py:127-147 — numpy only, pandas is not a dependency here)."""
    data = _load(data)
    det = data.get("detections", {})
    meta = data.get("video_metadata", {})
    fps = float(meta.get("fps", 30.0) or 30.0)
    frames_sampled = sorted(det)
    n_frames = int(meta.get("n_frames", (frames_sampled[-1] + 1) if frames_sampled else 0))

    frame_col, box_col = [], []
    for f in frames_sampled:
        for b in det[f]:
            frame_col.append(f)
            box_col.append(b)
    frame_col = np.asarray(frame_col, np.int64)
    boxes = (
        np.asarray(box_col, np.float64)
        if box_col
        else np.zeros((0, 4), np.float64)
    )
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    centers = np.stack(
        [(boxes[:, 0] + boxes[:, 2]) / 2, (boxes[:, 1] + boxes[:, 3]) / 2],
        axis=1,
    ) if len(boxes) else np.zeros((0, 2), np.float64)

    counts = np.zeros(max(n_frames, 1), np.int64)
    for f in frames_sampled:
        if f < len(counts):
            counts[f] = len(det[f])
    return {
        "keyword": data.get("keyword", "?"),
        "video": data.get("video", "?"),
        "fps": fps,
        "n_frames": n_frames,
        "frames_sampled": frames_sampled,
        "frame": frame_col,
        "boxes": boxes,
        "areas": areas,
        "centers": centers,
        "counts": counts,
        "timestamps": frame_col / fps,
    }


def stats_summary(data: DataOrPath) -> Dict[str, Any]:
    """Aggregate stats (role of the reference's stats textbox,
    app.py:330-369)."""
    data = _load(data)
    t = flatten_detections(data)
    n = len(t["frame"])
    sampled = len(t["frames_sampled"])
    det = data.get("detections", {})
    with_det = sum(1 for f in t["frames_sampled"] if len(det[f]) > 0)
    return {
        "keyword": t["keyword"],
        "video": t["video"],
        "total_detections": n,
        "frames_sampled": sampled,
        "frames_with_detections": with_det,
        "detection_rate": round(with_det / sampled, 4) if sampled else 0.0,
        "avg_detections_per_frame": round(n / sampled, 3) if sampled else 0.0,
        "max_detections_in_frame": int(t["counts"].max()) if len(t["counts"]) else 0,
        "avg_area": round(float(t["areas"].mean()), 5) if n else 0.0,
        "median_area": round(float(np.median(t["areas"])), 5) if n else 0.0,
        "duration_s": round(t["n_frames"] / t["fps"], 2),
    }


def format_stats(stats: Dict[str, Any]) -> str:
    return "\n".join(f"{k}: {v}" for k, v in stats.items())


def analysis_plots(
    data: DataOrPath, out_dir: str, prefix: str = "analysis"
) -> List[str]:
    """Write the 8-plot analysis suite as PNGs and return their paths
    (like-for-like with app.py:119-329's eight plots: counts/frame, area
    histogram, average area over time, center heatmap, timeline density,
    3x3 screen-region grid, box-size scatter, cumulative detections)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = flatten_detections(data)
    os.makedirs(out_dir, exist_ok=True)
    paths: List[str] = []

    def save(fig, name):
        p = os.path.join(out_dir, f"{prefix}_{name}.png")
        fig.savefig(p, dpi=110, bbox_inches="tight")
        plt.close(fig)
        paths.append(p)

    empty = len(t["frame"]) == 0

    # 1. detections per frame
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(np.arange(len(t["counts"])), t["counts"], drawstyle="steps-post")
    ax.set(xlabel="frame", ylabel="detections", title="Detections per frame")
    save(fig, "counts")

    # 2. area histogram
    fig, ax = plt.subplots(figsize=(8, 5))
    if not empty:
        ax.hist(t["areas"], bins=30)
    ax.set(xlabel="box area (frame fraction)", ylabel="count",
           title="Detection area distribution")
    save(fig, "area_hist")

    # 3. average area over time
    fig, ax = plt.subplots(figsize=(8, 5))
    if not empty:
        uf = np.unique(t["frame"])
        avg = [t["areas"][t["frame"] == f].mean() for f in uf]
        ax.plot(uf, avg)
    ax.set(xlabel="frame", ylabel="mean box area",
           title="Average detection area over time")
    save(fig, "avg_area")

    # 4. center heatmap
    fig, ax = plt.subplots(figsize=(7, 6))
    if not empty:
        h = ax.hist2d(t["centers"][:, 0], t["centers"][:, 1], bins=30,
                      range=[[0, 1], [0, 1]])
        fig.colorbar(h[3], ax=ax)
    ax.invert_yaxis()
    ax.set(xlabel="x", ylabel="y", title="Detection center heatmap")
    save(fig, "heatmap")

    # 5. timeline density (20 buckets over the video duration)
    fig, ax = plt.subplots(figsize=(8, 5))
    if not empty:
        edges = np.linspace(0, max(t["n_frames"], 1), 21)
        dens, _ = np.histogram(t["frame"], bins=edges)
        ax.bar(np.arange(20), dens)
    ax.set(xlabel="video timeline (20 segments)", ylabel="detections",
           title="Detection density over duration")
    save(fig, "density")

    # 6. 3x3 screen-region grid
    fig, ax = plt.subplots(figsize=(7, 6))
    grid = np.zeros((3, 3))
    if not empty:
        gx = np.clip((t["centers"][:, 0] * 3).astype(int), 0, 2)
        gy = np.clip((t["centers"][:, 1] * 3).astype(int), 0, 2)
        np.add.at(grid, (gy, gx), 1)
    im = ax.imshow(grid, cmap="viridis")
    for i in range(3):
        for j in range(3):
            ax.text(j, i, int(grid[i, j]), ha="center", va="center",
                    color="white")
    ax.set_xticks([0, 1, 2], ["left", "center", "right"])
    ax.set_yticks([0, 1, 2], ["top", "middle", "bottom"])
    ax.set_title("Screen-region detection counts")
    fig.colorbar(im, ax=ax)
    save(fig, "regions")

    # 7. box width x height scatter
    fig, ax = plt.subplots(figsize=(7, 6))
    if not empty:
        bw = t["boxes"][:, 2] - t["boxes"][:, 0]
        bh = t["boxes"][:, 3] - t["boxes"][:, 1]
        ax.scatter(bw, bh, s=12, alpha=0.5)
    ax.set(xlabel="box width", ylabel="box height",
           title="Box size distribution", xlim=(0, 1), ylim=(0, 1))
    save(fig, "sizes")

    # 8. cumulative detections over time
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(np.arange(len(t["counts"])), np.cumsum(t["counts"]))
    ax.set(xlabel="frame", ylabel="cumulative detections",
           title="Cumulative detections")
    save(fig, "cumulative")

    return paths


def _render_timeline_chart(
    t: Dict[str, Any], size: Tuple[int, int], bright: bool
) -> Tuple[np.ndarray, Any]:
    """Rasterize the timeline chart once; returns (RGB array, frame->px
    x-position mapper)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w, h = size
    with plt.style.context("dark_background"):
        fig, ax = plt.subplots(figsize=(w / 100, h / 100), dpi=100)
        color = "#00ff41" if bright else "#1c4d27"
        n = max(len(t["counts"]), 2)
        ax.plot(np.arange(len(t["counts"])), t["counts"],
                color=color, linewidth=1.5)
        ax.set_xlim(0, n - 1)
        ax.set_ylim(0, max(1, t["counts"].max()) * 1.15)
        ax.set_xlabel("frame", color=color)
        ax.set_ylabel("detections", color=color)
        ax.set_title(
            f"'{t['keyword']}' detections over time", color=color
        )
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        # frame index -> pixel x in the rasterized image
        pts = ax.transData.transform(
            np.stack([np.arange(n), np.zeros(n)], axis=1)
        )
        xs = pts[:, 0].astype(int)
        plt.close(fig)
    # canvas rows are top-down already with buffer_rgba
    return buf, xs


def render_timeline_video(
    data: DataOrPath,
    out_mp4: str,
    size: Tuple[int, int] = (960, 540),
    fps: Optional[float] = None,
    source_video: Optional[str] = None,
) -> str:
    """Animated detection-timeline video (role of the reference's
    video_visualization.py:64-199): the full curve in a dim green, the
    already-played portion bright, a red playhead, and a frame/count
    readout. With `source_video`, the timeline strip is stacked UNDER the
    (restyled) source frames like the reference's combined visualization."""
    from .video import VideoSink, VideoSource

    t = flatten_detections(data)
    fps = fps or t["fps"]
    n = max(t["n_frames"], 1)

    src_frames: Optional[List[np.ndarray]] = None
    if source_video:
        src = VideoSource(source_video)
        src_frames = list(src)
        src.release()
        n = max(n, len(src_frames))
        strip_h = size[1] // 3
        chart_size = (size[0], strip_h)
    else:
        chart_size = size

    dim, xs = _render_timeline_chart(t, chart_size, bright=False)
    bright, _ = _render_timeline_chart(t, chart_size, bright=True)
    ch, cw = dim.shape[:2]

    import cv2

    if src_frames is not None:
        out_w, out_h = size[0], size[1] - size[1] // 3 + ch
    else:
        out_w, out_h = cw, ch
    sink = VideoSink(out_mp4, fps, (out_w, out_h))
    for f in range(n):
        px = xs[min(f, len(xs) - 1)]
        chart = dim.copy()
        chart[:, :px] = bright[:, :px]
        cv2.line(chart, (px, 0), (px, ch - 1), (255, 32, 32), 1)
        cnt = int(t["counts"][f]) if f < len(t["counts"]) else 0
        cv2.putText(
            chart, f"FRAME {f:04d}  DETECTIONS {cnt}", (10, ch - 10),
            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 65), 1, cv2.LINE_AA,
        )
        if src_frames is not None:
            vid_h = out_h - ch
            frame = src_frames[min(f, len(src_frames) - 1)]
            frame = cv2.resize(frame, (out_w, vid_h))
            chart = np.concatenate([frame, chart], axis=0)
        sink.write(chart)
    sink.release()
    return out_mp4
