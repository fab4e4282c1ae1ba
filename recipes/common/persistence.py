"""Detection persistence: save/load per-frame detections as JSON.

Role of recipes/promptable-content-moderation/persistence.py:5-47 —
detections computed once can be re-styled into new videos without
re-running the model.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict


def save_detection_data(data: Dict[str, Any], output_file: str) -> bool:
    try:
        d = os.path.dirname(output_file)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(output_file, "w") as f:
            json.dump(data, f, indent=2)
        return True
    except OSError as e:
        print(f"error saving detection data: {e}")
        return False


def load_detection_data(input_file: str) -> Dict[str, Any]:
    with open(input_file) as f:
        data = json.load(f)
    # JSON round-trips frame indices as strings; normalize back to int keys
    if "detections" in data and isinstance(data["detections"], dict):
        data["detections"] = {
            int(k): [tuple(b) for b in v] for k, v in data["detections"].items()
        }
    return data
