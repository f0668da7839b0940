"""Dataset loaders and the dataloader registry.

Mirrors the reference's loader inventory and factory
(python/kiss_icp/datasets/__init__.py:27-83) with an explicit registry instead
of reflection/AST inspection: every loader registers a constructor name here,
optional heavy dependencies are imported lazily inside each loader, and the
factory gives an actionable error when one is missing.

A loader is any object with:
  * `__len__()` -> number of scans
  * `__getitem__(idx)` -> either `points (N,3) float` or `(points, timestamps)`
  * optional `gt_poses` (M,4,4) numpy array
  * optional `apply_calibration(poses)` for writing results in the GT frame
  * optional `sequence_id` string used in result naming
"""

from __future__ import annotations

import importlib
from pathlib import Path
from typing import Any, Dict, List, Optional

# Loader name -> (module, class). Matches the reference's set (SURVEY.md Y12-Y26)
# plus the TPU-repo-specific "synthetic" procedural generator.
_LOADERS: Dict[str, str] = {
    "kitti": "kiss_icp_tpu.datasets.kitti:KITTIOdometryDataset",
    "kitti_raw": "kiss_icp_tpu.datasets.kitti_raw:KITTIRawDataset",
    "mulran": "kiss_icp_tpu.datasets.mulran:MulranDataset",
    "ncd": "kiss_icp_tpu.datasets.ncd:NewerCollegeDataset",
    "nclt": "kiss_icp_tpu.datasets.nclt:NCLTDataset",
    "nuscenes": "kiss_icp_tpu.datasets.nuscenes:NuScenesDataset",
    "apollo": "kiss_icp_tpu.datasets.apollo:ApolloDataset",
    "boreas": "kiss_icp_tpu.datasets.boreas:BoreasDataset",
    "tum": "kiss_icp_tpu.datasets.tum:TUMDataset",
    "helipr": "kiss_icp_tpu.datasets.helipr:HeLiPRDataset",
    "rosbag": "kiss_icp_tpu.datasets.rosbag:RosbagDataset",
    "mcap": "kiss_icp_tpu.datasets.mcap:McapDataset",
    "ouster": "kiss_icp_tpu.datasets.ouster:OusterDataset",
    "generic": "kiss_icp_tpu.datasets.generic:GenericDataset",
    "synthetic": "kiss_icp_tpu.datasets.synthetic:SyntheticDataset",
}

# Loaders that take a sequence index (reference datasets/__init__.py:40-42).
SEQUENCE_DATALOADERS = ["kitti", "kitti_raw", "nuscenes", "helipr"]
# Loaders that support --jump (all but streaming readers,
# reference datasets/__init__.py:53-58).
NON_JUMPABLE_DATALOADERS = ["mcap", "ouster", "rosbag"]

# Cloud-file extensions the generic loader understands
# (reference datasets/__init__.py:27-37).
SUPPORTED_FILE_EXTENSIONS = {"bin", "pcd", "ply", "xyz", "obj", "ctm", "off", "stl"}


def available_dataloaders() -> List[str]:
    return sorted(_LOADERS)


def jumpable_dataloaders() -> List[str]:
    return [n for n in available_dataloaders() if n not in NON_JUMPABLE_DATALOADERS]


def sequence_dataloaders() -> List[str]:
    return list(SEQUENCE_DATALOADERS)


def supported_file_extensions() -> List[str]:
    return sorted(SUPPORTED_FILE_EXTENSIONS)


def dataset_factory(dataloader: str, data_dir: Path, *args: Any, **kwargs: Any):
    """Instantiate a loader by name (reference datasets/__init__.py:61-83)."""
    if dataloader not in _LOADERS:
        raise ValueError(
            f"Unknown dataloader '{dataloader}'. Supported: {available_dataloaders()}"
        )
    module_name, _, class_name = _LOADERS[dataloader].partition(":")
    module = importlib.import_module(module_name)
    cls = getattr(module, class_name)
    return cls(data_dir, *args, **kwargs)


def guess_dataloader(data: Path) -> Optional[str]:
    """Infer the dataloader from the path's extension/layout
    (reference tools/cmd.py:38-59)."""
    data = Path(data)
    if data.is_file():
        ext = data.suffix.lower()
        if ext == ".bag":
            return "rosbag"
        if ext == ".pcap":
            return "ouster"
        if ext == ".mcap":
            return "mcap"
        if data.name == "metadata.yaml":
            # The reference routes the bag's metadata file itself to rosbag
            # (tools/cmd.py:44-46); rosbags' AnyReader opens the parent dir.
            return "rosbag"
        return None
    if data.is_dir():
        entries = {p.name for p in data.iterdir()}
        if "metadata.yaml" in entries:
            # ROS2 bag directory — either sqlite3 (.db3) or mcap storage;
            # rosbags' AnyReader reads both (reference cmd.py:47-48 keys on
            # metadata.yaml alone for the same reason).
            return "rosbag"
        if "velodyne" in entries:  # KITTI-odometry sequence dir
            return None  # ambiguous: kitti wants the dataset root; let CLI decide
    return None
