"""Train the LFNST kernels (kernels/lfnst_tables.py).

Derivation mirrors how VVC's constants were produced, regenerated from
this codec's own statistics instead of copied: collect the primary
DCT2/DCT2 coefficients of intra residuals from the synthetic corpus,
fold each 4x4 low band into its mode-class canonical orientation
(kernels.lfnst.mode_class), and take per-class KLTs (eigenvectors of
the 16-dim covariance, decreasing eigenvalue order) as the kernel rows.
Kernel 0 trains on the lower-energy half of each class, kernel 1 on the
higher-energy half — two alternatives specialized by activity.

Quantization: round(v * 128) clipped to +-127 (the |m| <= 127 bound is
what keeps kernels.lfnst._exact_matvec exact on the MXU).

Run:  python tools/train_lfnst.py        (rewrites the tables in place)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from x266_tpu.core.yuv import synthetic_clip  # noqa: E402
from x266_tpu.kernels import intra as kintra  # noqa: E402
from x266_tpu.kernels import transforms as ktx  # noqa: E402

N_MODES = 67
DIAG = 34


def mode_class_np(mode):
    t = mode > DIAG
    a = np.where(t, 2 * DIAG - mode, mode)
    a = np.clip(a, 2, DIAG)
    s = 1 + np.minimum(2, (3 * (a - 2)) // (DIAG - 1))
    s = np.where(mode <= 1, 0, s)
    t = np.where(mode <= 1, False, t)
    return s, t


def collect(seed: int, size: int = 8):
    """Best-SAD-mode intra residuals -> primary coefs' 4x4 low bands."""
    frames = synthetic_clip(256, 256, 4, kind="mixed", seed=seed)
    out = {c: [] for c in range(4)}
    for fr in frames:
        y = fr.y.astype(np.int32)
        h, w = y.shape
        gy, gx = h // size, w // size
        # reference vectors from the original plane (training proxy)
        pad = np.full((h + 1 + 2 * size, w + 1 + 2 * size), 128,
                      np.int32)
        pad[1:h + 1, 1:w + 1] = y
        refs = []
        for by in range(gy):
            for bx in range(gx):
                x0, y0 = bx * size, by * size
                top = pad[y0, x0:x0 + 2 * size + 1]
                left = pad[y0 + 1:y0 + 1 + 2 * size, x0]
                refs.append(np.concatenate([top, left]))
        refs = jnp.asarray(np.stack(refs))
        preds = kintra.predict_all_modes(refs, size, N_MODES)
        blocks = y.reshape(gy, size, gx, size).transpose(
            0, 2, 1, 3).reshape(-1, 1, size, size)
        res = blocks - np.asarray(preds)
        sad = np.abs(res).sum(axis=(2, 3))
        best = sad.argmin(axis=1)
        res_b = np.take_along_axis(
            res, best[:, None, None, None], axis=1)[:, 0]
        coefs = np.asarray(ktx.forward_transform(
            jnp.asarray(res_b), size))
        low = coefs[:, :4, :4]
        cls, tr = mode_class_np(best)
        low = np.where(tr[:, None, None], low.transpose(0, 2, 1), low)
        for c in range(4):
            sel = low[cls == c]
            if len(sel):
                out[c].append(sel.reshape(-1, 16))
    return {c: (np.concatenate(v) if v else np.zeros((0, 16)))
            for c, v in out.items()}


def klt(x: np.ndarray) -> np.ndarray:
    """(N, 16) samples -> (16, 16) int kernel (rows = eigenvectors)."""
    if len(x) < 64:
        return np.eye(16, dtype=np.int32) * 128
    cov = (x.T @ x) / len(x)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    rows = v[:, order].T
    # sign convention: first nonzero entry of each row positive
    for i in range(16):
        j = np.argmax(np.abs(rows[i]) > 1e-9)
        if rows[i, j] < 0:
            rows[i] = -rows[i]
    return np.clip(np.round(rows * 128), -127, 127).astype(np.int32)


def main():
    data = {c: [] for c in range(4)}
    for seed in (11, 23, 37, 51):
        for c, v in collect(seed).items():
            if len(v):
                data[c].append(v)
    tables = []
    for c in range(4):
        x = (np.concatenate(data[c]) if data[c]
             else np.zeros((0, 16))).astype(np.float64)
        e = (x ** 2).sum(axis=1)
        med = np.median(e) if len(e) else 0.0
        tables.append(klt(x[e <= med]))       # kernel 0: low activity
        tables.append(klt(x[e > med]))        # kernel 1: high activity
        print(f"set {c}: {len(x)} samples")
    arr = np.stack(tables)                    # (8, 16, 16)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "x266_tpu", "kernels",
        "lfnst_tables.py")
    with open(path, "w") as f:
        f.write('"""Trained LFNST kernels (tools/train_lfnst.py; do '
                'not hand-edit).\n\n(8, 16, 16) int32: set*2 + kernel '
                '-> 16x16 matrix at 1<<7 scale, rows =\nKLT '
                'eigenvectors of the class\'s primary-coefficient '
                'covariance.\n"""\n\nimport numpy as np\n\n'
                'TABLES = np.array(\n')
        f.write(repr(arr.tolist()))
        f.write(', dtype=np.int32)\n')
    print("wrote", path)


if __name__ == "__main__":
    main()
