"""Calibration / dataset JSON I/O, byte-compatible with the reference's
cereal JSON archives.

The reference persists:
  * ``opt_calib.json`` — ``Calibration { T_i_c, intrinsics }`` with the
    polymorphic camera form (``cam_type``, ``fx..p4``, ``width``, ``height``)
    — serialization.h:116-174; produced by calibration.cpp:430-439 and
    consumed by sfm.cpp:933-957.
  * ``calibration-double-sphere.json`` — DS-specific intrinsics
    (``fx,fy,cx,cy,xi,alpha``) — serialization.h:92-113, loaded by
    calibration.cpp:279-302.
  * ``init_poses.json`` / ``detected_corners.json`` — maps keyed by
    FrameCamId with cereal's positional ``value0/value1/...`` naming —
    serialization.h:145-153.

cereal wraps the archive root in ``{"value0": ...}`` and NVP fields keep
their C++ names (``cam.T_i_c`` etc.); we reproduce that exactly so the two
implementations can exchange files.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

# pose json <-> (7,) [tx,ty,tz,qx,qy,qz,qw]


def pose_from_json(d: dict) -> np.ndarray:
    return np.array(
        [d["px"], d["py"], d["pz"], d["qx"], d["qy"], d["qz"], d["qw"]], np.float64
    )


def pose_to_json(p) -> dict:
    p = np.asarray(p, np.float64)
    return {
        "px": float(p[0]), "py": float(p[1]), "pz": float(p[2]),
        "qx": float(p[3]), "qy": float(p[4]), "qz": float(p[5]), "qw": float(p[6]),
    }


@dataclass
class Calibration:
    """Mirror of visnav::Calibration (include/visnav/calibration.h:83-93):
    per-camera extrinsics T_i_c (camera-to-IMU) and intrinsics."""

    T_i_c: np.ndarray                    # (num_cams, 7)
    intrinsics: np.ndarray               # (num_cams, 8)
    cam_types: list = field(default_factory=list)   # model name per cam
    widths: list = field(default_factory=list)
    heights: list = field(default_factory=list)

    @property
    def num_cams(self) -> int:
        return self.T_i_c.shape[0]


def load_calibration(path: str) -> Calibration:
    """Load the polymorphic-camera form (opt_calib.json)."""
    with open(path) as f:
        root = json.load(f)["value0"]
    T_i_c = np.stack([pose_from_json(p) for p in root["cam.T_i_c"]])
    intr, types, ws, hs = [], [], [], []
    for c in root["cam.intrinsics"]:
        intr.append([c["fx"], c["fy"], c["cx"], c["cy"],
                     c["p1"], c["p2"], c["p3"], c["p4"]])
        types.append(c["cam_type"])
        ws.append(int(c.get("width", 0)))
        hs.append(int(c.get("height", 0)))
    return Calibration(T_i_c, np.array(intr, np.float64), types, ws, hs)


def save_calibration(path: str, calib: Calibration) -> None:
    root = {
        "cam.T_i_c": [pose_to_json(p) for p in calib.T_i_c],
        "cam.intrinsics": [
            {
                "cam_type": calib.cam_types[i],
                "fx": float(calib.intrinsics[i][0]),
                "fy": float(calib.intrinsics[i][1]),
                "cx": float(calib.intrinsics[i][2]),
                "cy": float(calib.intrinsics[i][3]),
                "p1": float(calib.intrinsics[i][4]),
                "p2": float(calib.intrinsics[i][5]),
                "p3": float(calib.intrinsics[i][6]),
                "p4": float(calib.intrinsics[i][7]),
                "width": int(calib.widths[i]) if calib.widths else 0,
                "height": int(calib.heights[i]) if calib.heights else 0,
            }
            for i in range(calib.num_cams)
        ],
    }
    with open(path, "w") as f:
        json.dump({"value0": root}, f, indent=4)


def load_ds_calibration(path: str) -> Calibration:
    """Load the double-sphere initialisation form
    (calibration-double-sphere.json; extra IMU fields ignored)."""
    with open(path) as f:
        root = json.load(f)["value0"]
    T_i_c = np.stack([pose_from_json(p) for p in root["cam.T_i_c"]])
    intr = []
    for c in root["cam.intrinsics"]:
        intr.append([c["fx"], c["fy"], c["cx"], c["cy"],
                     c["xi"], c["alpha"], 0.0, 0.0])
    return Calibration(T_i_c, np.array(intr, np.float64), ["ds"] * len(intr))


def _fcid_key(entry: dict) -> tuple:
    return (int(entry["key"]["first"]), int(entry["key"]["second"]))


def load_detected_corners(path: str) -> dict:
    """{(frame, cam): {"corners": (N,2), "corner_ids": (N,)}} from
    detected_corners.json (CalibCornerData, serialization.h:145-148)."""
    with open(path) as f:
        root = json.load(f)["value0"]
    out = {}
    for entry in root:
        v = entry["value"]
        corners = np.array(
            [[c["value0"], c["value1"]] for c in v["value0"]], np.float64
        ).reshape(-1, 2)
        ids = np.array(v["value1"], np.int32)
        out[_fcid_key(entry)] = {"corners": corners, "corner_ids": ids}
    return out


def load_init_poses(path: str) -> dict:
    """{(frame, cam): T_a_c (7,)} from init_poses.json
    (CalibInitPoseData, serialization.h:150-153)."""
    with open(path) as f:
        root = json.load(f)["value0"]
    return {_fcid_key(e): pose_from_json(e["value"]["value0"]) for e in root}
