"""Reference-compatible binary ``.mvs`` checkpoint files.

Layout (TMVS/io/filewriter.cpp:71-102 / fileloader.cpp:403-472):
  "MVS_V3\\n"
  raw MvsConfig struct (160 bytes, MSVC layout — see config.py)
  "CAMERAS <n>\\n"
  per camera: int32 name length, name bytes, f64x3 center, f64x2 focal,
              f64x2 principal, f64x4 quaternion (wxyz), f64 radial distortion
  "PATCHES <n>\\n"
  per patch: f64x3 center, f64x2 spherical normal, int32 camNum,
             int32 x camNum camera indices, f64 fitness, f64 correlation

``MVS_V2`` (no config blob) is accepted on read (fileloader.cpp:432-435).
This format IS the reference's checkpoint/resume mechanism — staged dumps
and the expansion autosave both use it (SURVEY.md §5.4).
"""

from __future__ import annotations

import struct
from typing import List, NamedTuple, Optional

import numpy as np

from pais_mvs_tpu.config import (MvsConfig, MVS_CONFIG_STRUCT_SIZE,
                                 pack_config_binary, unpack_config_binary)
from pais_mvs_tpu.models.camera import CameraParams


class MvsPatchData(NamedTuple):
    centers: np.ndarray        # [M, 3]
    normal_sph: np.ndarray     # [M, 2]
    cam_masks: np.ndarray      # [M, C] bool
    fitness: np.ndarray        # [M]
    correlation: np.ndarray    # [M]


class MvsFile(NamedTuple):
    config: Optional[MvsConfig]
    cameras: List[CameraParams]
    patches: MvsPatchData


def write_mvs(path: str, cfg: MvsConfig, cameras: List[CameraParams],
              patches: MvsPatchData) -> None:
    with open(path, "wb") as f:
        f.write(b"MVS_V3\n")
        f.write(pack_config_binary(cfg))
        f.write(f"CAMERAS {len(cameras)}\n".encode())
        for c in cameras:
            name = c.file_name.encode()
            f.write(struct.pack("<i", len(name)))
            f.write(name)
            f.write(struct.pack("<3d", *np.asarray(c.center, dtype=np.float64)))
            f.write(struct.pack("<2d", *np.asarray(c.focal, dtype=np.float64)))
            f.write(struct.pack("<2d", *np.asarray(c.principal,
                                                   dtype=np.float64)))
            f.write(struct.pack("<4d", *np.asarray(c.quaternion,
                                                   dtype=np.float64)))
            f.write(struct.pack("<d", float(c.radial_distortion)))
        M = len(patches.centers)
        f.write(f"PATCHES {M}\n".encode())
        for m in range(M):
            f.write(struct.pack("<3d", *patches.centers[m].astype(np.float64)))
            f.write(struct.pack("<2d",
                                *patches.normal_sph[m].astype(np.float64)))
            idx = np.nonzero(patches.cam_masks[m])[0]
            f.write(struct.pack("<i", len(idx)))
            for ci in idx:
                f.write(struct.pack("<i", int(ci)))
            f.write(struct.pack("<d", float(patches.fitness[m])))
            f.write(struct.pack("<d", float(patches.correlation[m])))


def _read_line(f) -> str:
    out = b""
    while True:
        ch = f.read(1)
        if not ch or ch == b"\n":
            break
        out += ch
    return out.decode(errors="replace")


def read_mvs(path: str) -> MvsFile:
    with open(path, "rb") as f:
        header = _read_line(f).split()
        if not header or header[0] not in ("MVS_V2", "MVS_V3"):
            raise ValueError(f"not an MVS file: {path}")
        cfg = None
        if header[0] == "MVS_V3":
            cfg = unpack_config_binary(f.read(MVS_CONFIG_STRUCT_SIZE))
        tok = _read_line(f).split()
        assert tok[0] == "CAMERAS", tok
        n_cams = int(tok[1])
        cameras = []
        for _ in range(n_cams):
            (ln,) = struct.unpack("<i", f.read(4))
            name = f.read(ln).decode(errors="replace")
            center = np.array(struct.unpack("<3d", f.read(24)))
            focal = np.array(struct.unpack("<2d", f.read(16)))
            principal = np.array(struct.unpack("<2d", f.read(16)))
            quaternion = np.array(struct.unpack("<4d", f.read(32)))
            (rd,) = struct.unpack("<d", f.read(8))
            cameras.append(CameraParams(
                file_name=name, focal=focal, principal=principal,
                quaternion=quaternion, center=center, radial_distortion=rd))
        tok = _read_line(f).split()
        assert tok[0] == "PATCHES", tok
        M = int(tok[1])
        centers = np.zeros((M, 3))
        sph = np.zeros((M, 2))
        masks = np.zeros((M, n_cams), dtype=bool)
        fit = np.zeros(M)
        corr = np.zeros(M)
        for m in range(M):
            centers[m] = struct.unpack("<3d", f.read(24))
            sph[m] = struct.unpack("<2d", f.read(16))
            (k,) = struct.unpack("<i", f.read(4))
            for _ in range(k):
                (ci,) = struct.unpack("<i", f.read(4))
                if 0 <= ci < n_cams:
                    masks[m, ci] = True
            (fit[m],) = struct.unpack("<d", f.read(8))
            (corr[m],) = struct.unpack("<d", f.read(8))
    return MvsFile(cfg, cameras,
                   MvsPatchData(centers, sph, masks, fit, corr))
