"""Artifact store — interop with the reference's on-disk calibration schema.

Reads and writes the exact file layout the reference produces, so existing
calibration results drop straight into this framework:

- ``results/intrinsic_params/{cam}_matrix.txt`` / ``{cam}_distortion.txt``
  / ``{cam}_intrinsics.pkl`` (reference: intrinsic.py:410-448),
- ``results/extrinsic_params/stereo_rotation_matrix.txt``,
  ``stereo_translation_vector.txt``, ``essential_matrix.txt``,
  ``fundamental_matrix.txt``, ``extrinsic_params.pkl``
  (extrinsic.py:457-460; load contract ball_drop.py:162-223),
- rectification products ``rect_R1/R2.txt``, ``rect_P1/P2.txt``,
  ``disparity_to_depth_matrix.txt`` (calibrate_v3/v4 schema, SURVEY.md §2c),
- ``sync_data.pkl`` offset cache (ball_drop.py:15-74).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from stereo_vision_tpu.track.fusion import StereoRig


class ArtifactStore:
    """Test-directory-rooted artifact persistence (reference layout)."""

    def __init__(self, test_dir: str | Path):
        self.root = Path(test_dir)
        self.results = self.root / "results"
        self.intrinsic_dir = self.results / "intrinsic_params"
        self.extrinsic_dir = self.results / "extrinsic_params"
        self.rectify_dir = self.results / "rectification"
        self.sync_dir = self.results / "sync_results"

    # -- intrinsics ---------------------------------------------------------

    def save_intrinsics(self, camera_id: str, K: np.ndarray, dist: np.ndarray, rms: float | None = None) -> None:
        self.intrinsic_dir.mkdir(parents=True, exist_ok=True)
        K = np.asarray(K, np.float64)
        dist = np.asarray(dist, np.float64).reshape(1, -1)
        np.savetxt(self.intrinsic_dir / f"{camera_id}_matrix.txt", K)
        np.savetxt(self.intrinsic_dir / f"{camera_id}_distortion.txt", dist)
        with open(self.intrinsic_dir / f"{camera_id}_intrinsics.pkl", "wb") as f:
            pickle.dump((K, dist), f)
        if rms is not None:
            (self.intrinsic_dir / f"{camera_id}_info.txt").write_text(
                f"Camera: {camera_id}\nRMS Reprojection Error: {rms}\n"
            )

    def load_intrinsics(self, camera_id: str) -> tuple[np.ndarray, np.ndarray]:
        """pkl-first, txt fallback (ball_drop.py:176-189)."""
        pkl = self.intrinsic_dir / f"{camera_id}_intrinsics.pkl"
        if pkl.exists():
            with open(pkl, "rb") as f:
                K, dist = pickle.load(f)
        else:
            K = np.loadtxt(self.intrinsic_dir / f"{camera_id}_matrix.txt")
            dist = np.loadtxt(self.intrinsic_dir / f"{camera_id}_distortion.txt")
        return np.asarray(K, np.float64), np.asarray(dist, np.float64).reshape(-1)

    # -- extrinsics ---------------------------------------------------------

    def save_extrinsics(
        self,
        R: np.ndarray,
        T: np.ndarray,
        E: np.ndarray | None = None,
        F: np.ndarray | None = None,
    ) -> None:
        self.extrinsic_dir.mkdir(parents=True, exist_ok=True)
        np.savetxt(self.extrinsic_dir / "stereo_rotation_matrix.txt", np.asarray(R))
        np.savetxt(
            self.extrinsic_dir / "stereo_translation_vector.txt",
            np.asarray(T).reshape(3, 1),
        )
        if E is not None:
            np.savetxt(self.extrinsic_dir / "essential_matrix.txt", np.asarray(E))
        if F is not None:
            np.savetxt(self.extrinsic_dir / "fundamental_matrix.txt", np.asarray(F))
        with open(self.extrinsic_dir / "extrinsic_params.pkl", "wb") as f:
            pickle.dump({"R": np.asarray(R), "T": np.asarray(T).reshape(3, 1)}, f)

    def load_extrinsics(self) -> tuple[np.ndarray, np.ndarray]:
        """pkl-first, txt fallback (ball_drop.py:196-211)."""
        pkl = self.extrinsic_dir / "extrinsic_params.pkl"
        if pkl.exists():
            with open(pkl, "rb") as f:
                d = pickle.load(f)
            return np.asarray(d["R"]), np.asarray(d["T"]).reshape(3, 1)
        R = np.loadtxt(self.extrinsic_dir / "stereo_rotation_matrix.txt")
        T = np.loadtxt(self.extrinsic_dir / "stereo_translation_vector.txt").reshape(3, 1)
        return R, T

    def load_rig(self) -> StereoRig:
        """Full calibration bundle (load_calibration, ball_drop.py:162-223)."""
        K1, d1 = self.load_intrinsics("left")
        K2, d2 = self.load_intrinsics("right")
        R, T = self.load_extrinsics()
        return StereoRig(K1=K1, d1=d1, K2=K2, d2=d2, R=R, T=T)

    # -- rectification ------------------------------------------------------

    def save_rectification(self, R1, R2, P1, P2, Q) -> None:
        self.rectify_dir.mkdir(parents=True, exist_ok=True)
        np.savetxt(self.rectify_dir / "rect_R1.txt", np.asarray(R1))
        np.savetxt(self.rectify_dir / "rect_R2.txt", np.asarray(R2))
        np.savetxt(self.rectify_dir / "rect_P1.txt", np.asarray(P1))
        np.savetxt(self.rectify_dir / "rect_P2.txt", np.asarray(P2))
        np.savetxt(self.rectify_dir / "disparity_to_depth_matrix.txt", np.asarray(Q))

    def load_rectification(self):
        return tuple(
            np.loadtxt(self.rectify_dir / n)
            for n in (
                "rect_R1.txt",
                "rect_R2.txt",
                "rect_P1.txt",
                "rect_P2.txt",
                "disparity_to_depth_matrix.txt",
            )
        )

    # -- sync ----------------------------------------------------------------

    def save_sync(self, left_flash: int, right_flash: int, offset: int) -> None:
        self.sync_dir.mkdir(parents=True, exist_ok=True)
        with open(self.sync_dir / "sync_data.pkl", "wb") as f:
            pickle.dump(
                {
                    "left_flash_frame": left_flash,
                    "right_flash_frame": right_flash,
                    "frame_offset": offset,
                },
                f,
            )

    def load_sync(self) -> dict | None:
        p = self.sync_dir / "sync_data.pkl"
        if not p.exists():
            return None
        with open(p, "rb") as f:
            return pickle.load(f)


# -- cv2 FileStorage / CSV interop (calibrate_v3 schema) ---------------------

def save_calibration_xml(path, K1, d1, K2, d2, R, T, E=None, F=None) -> None:
    """OpenCV FileStorage XML/YAML bundle (calibration_utils.py:15-255
    schema: the v3 generation persisted XML alongside txt/csv)."""
    import cv2

    fs = cv2.FileStorage(str(path), cv2.FILE_STORAGE_WRITE)
    try:
        fs.write("camera_matrix_1", np.asarray(K1, np.float64))
        fs.write("dist_coeffs_1", np.asarray(d1, np.float64).reshape(1, -1))
        fs.write("camera_matrix_2", np.asarray(K2, np.float64))
        fs.write("dist_coeffs_2", np.asarray(d2, np.float64).reshape(1, -1))
        fs.write("R", np.asarray(R, np.float64))
        fs.write("T", np.asarray(T, np.float64).reshape(3, 1))
        if E is not None:
            fs.write("E", np.asarray(E, np.float64))
        if F is not None:
            fs.write("F", np.asarray(F, np.float64))
    finally:
        fs.release()


def load_calibration_xml(path):
    """Read a FileStorage bundle back: (K1, d1, K2, d2, R, T)."""
    import cv2

    fs = cv2.FileStorage(str(path), cv2.FILE_STORAGE_READ)
    try:
        out = tuple(
            fs.getNode(k).mat()
            for k in (
                "camera_matrix_1",
                "dist_coeffs_1",
                "camera_matrix_2",
                "dist_coeffs_2",
                "R",
                "T",
            )
        )
    finally:
        fs.release()
    return out


def load_calibration_results_pkl(path):
    """Read the reference's per-camera ``calibration_results.pkl`` schema
    (committed in calibration_tests/calibrate_v1..v2: dict with
    camera_matrix / dist_coeffs / rvecs / tvecs / reprojection_error).

    Returns (K (3,3), dist (N,), rvecs (F,3), tvecs (F,3), rms) — a user
    migrating from the reference brings these files directly.
    """
    import pickle

    with open(path, "rb") as f:
        d = pickle.load(f)
    K = np.asarray(d["camera_matrix"], np.float64)
    dist = np.asarray(d["dist_coeffs"], np.float64).ravel()
    rvecs = np.asarray([np.asarray(r).ravel() for r in d["rvecs"]], np.float64)
    tvecs = np.asarray([np.asarray(t).ravel() for t in d["tvecs"]], np.float64)
    return K, dist, rvecs, tvecs, float(d.get("reprojection_error", np.nan))


def save_calibration_csv(path, K, dist) -> None:
    """Flat CSV export (calibrate_v3 csv schema: name,value rows)."""
    import csv

    K = np.asarray(K)
    dist = np.asarray(dist).ravel()
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["parameter", "value"])
        w.writerow(["fx", K[0, 0]])
        w.writerow(["fy", K[1, 1]])
        w.writerow(["cx", K[0, 2]])
        w.writerow(["cy", K[1, 2]])
        for i, v in enumerate(dist):
            w.writerow([f"dist_{i}", v])
