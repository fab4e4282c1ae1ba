"""Shared infrastructure for the video recipes.

The reference ships three standalone video apps (recipes/gaze-detection-video,
recipes/promptable-content-moderation, recipes/promptable-video-redaction)
that duplicate ~2.5k LoC of video plumbing, tiling, drawing, and tracking.
Here that plumbing is factored into one package, and the model calls are
batched: sampled frames are encoded through the TPU ViT as one batch
(`MoondreamModel.encode_images`) instead of the reference's strictly
sequential per-frame `detect()` loop.
"""

from .video import VideoSource, VideoSink, video_io, sample_frames  # noqa: F401
from .tracker import IoUTracker, Track  # noqa: F401
from .overlay import (  # noqa: F401
    REGION_STYLES,
    apply_style,
    color_cycle,
    draw_boxes,
    draw_gaze,
    draw_hitmarker,
    pixelate_regions,
)
from .persistence import save_detection_data, load_detection_data  # noqa: F401
from .tiling import split_into_tiles, tile_box_to_frame, merge_tile_boxes  # noqa: F401
