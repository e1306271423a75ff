"""Checkpoint / resume (SURVEY.md §5).

Encoder state between GOPs is tiny — the next POC and the bytes already
emitted — because GOPs are closed (IDR-started) units [STD]: resuming at
a GOP boundary is bit-exact by construction.  A checkpoint is the
partial bitstream file plus a JSON sidecar; `resume` validates the
config fingerprint and returns where to continue.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os

from x266_tpu.config import CodecConfig


def _cfg_fingerprint(cfg: CodecConfig) -> str:
    payload = json.dumps(dataclasses.asdict(cfg), sort_keys=True,
                         default=int)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class CheckpointWriter:
    """Appends NALs to `path` and records resumable GOP boundaries in
    `path + '.ckpt'`."""

    def __init__(self, path: str, cfg: CodecConfig):
        self.path = path
        self.ckpt_path = path + ".ckpt"
        self.cfg = cfg
        self._fp = open(path, "wb")
        self._bytes = 0

    def append_nal(self, nal: bytes) -> None:
        self._fp.write(nal)
        self._bytes += len(nal)

    def mark_gop_boundary(self, next_poc: int) -> None:
        """Durable point: everything up to here is complete output."""
        self._fp.flush()
        os.fsync(self._fp.fileno())
        state = {"next_poc": next_poc, "byte_offset": self._bytes,
                 "cfg": _cfg_fingerprint(self.cfg)}
        tmp = self.ckpt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.ckpt_path)

    def close(self) -> None:
        self._fp.close()


def resume_state(path: str, cfg: CodecConfig) -> tuple[int, int] | None:
    """Returns (next_poc, byte_offset) if a valid checkpoint exists for
    this config, else None (start from scratch)."""
    ckpt_path = path + ".ckpt"
    if not (os.path.exists(ckpt_path) and os.path.exists(path)):
        return None
    with open(ckpt_path) as f:
        state = json.load(f)
    if state.get("cfg") != _cfg_fingerprint(cfg):
        return None
    if os.path.getsize(path) < state["byte_offset"]:
        return None
    return state["next_poc"], state["byte_offset"]


def truncate_to_checkpoint(path: str, byte_offset: int) -> None:
    """Drop any partial GOP written after the last durable boundary."""
    with open(path, "r+b") as f:
        f.truncate(byte_offset)
