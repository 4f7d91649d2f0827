"""Peak-RSS comparison: eager vs mmap-streamed packed-index loading.

Writes a GB-scale --normalize packed npz once (dense normalized tokens, no
object arrays), then loads it through ``RetrievalEngine.from_npz`` in a fresh
subprocess per mode and reports ``ru_maxrss``:

- eager: np.load copy + doc-axis pad copy + one-shot device_put
- mmap:  zero-copy memmap views + per-shard streamed device_put
  (tools/convert_packed.py: load_packed_payload mmap_docs=True +
  parallel/sharded_index.py: _shard_docs_streamed)

    python scripts/measure_rss.py [--n_docs 100000] [--dtype float32|int8]

Run on the CPU backend by default so it is independent of the TPU tunnel;
on a real TPU host the mmap win is larger still (device buffers live in HBM,
so host RSS is pure loading cost).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

_CHILD = r"""
import os, resource, json, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# 8 virtual devices: per-shard streaming slices are 1/8 of the index (the
# streaming path's host working set is one shard; a 1-device mesh would
# degenerate to shard == whole index)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
sys.path.insert(0, {repo!r})
import numpy as np
from evdr_tpu.engine import RetrievalEngine
from evdr_tpu.parallel import make_mesh

eng = RetrievalEngine.from_npz({path!r}, mmap={mmap}, dtype={dtype!r},
                               impl="xla", mesh=make_mesh(8))
# measure at the interesting point: index fully loaded + device-resident,
# BEFORE any query (the query program's own transients are mode-independent)
load_peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
status = dict(l.split(":", 1) for l in open("/proc/self/status") if ":" in l)
anon_mb = float(status.get("RssAnon", "0 kB").split()[0]) / 1024.0
file_mb = float(status.get("RssFile", "0 kB").split()[0]) / 1024.0
d = 128
Q = np.zeros((2, 4, d), np.float32)
qm = np.ones((2, 4), bool)
vals, idx = eng.search_dense(Q, qm, k=3)
assert idx.shape == (2, 3)
print(json.dumps({{"load_peak_rss_mb": round(load_peak_mb, 1),
                   "anon_rss_mb": round(anon_mb, 1),
                   "file_rss_mb": round(file_mb, 1),
                   "n_docs": eng.n_docs}}))
"""


def write_packed(path, n_docs: int, lp: int, d: int, dtype: str) -> float:
    rng = np.random.default_rng(0)
    out = {"doc_normalized": np.asarray(True),
           "pmask": np.ones((n_docs, lp), bool)}
    # build in slabs to keep THIS process light too
    if dtype == "int8":
        codes = np.empty((n_docs, lp, d), np.int8)
        scale = np.empty((n_docs, lp), np.float32)
        for s in range(0, n_docs, 50_000):
            e = min(s + 50_000, n_docs)
            x = rng.normal(size=(e - s, lp, d)).astype(np.float32)
            x /= np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12
            amax = np.abs(x).max(-1)
            sc = amax / 127.0
            codes[s:e] = np.clip(np.rint(x / sc[..., None]), -127, 127)
            scale[s:e] = sc
        out["P_codes"], out["P_scale"] = codes, scale
    elif dtype == "int4":
        from evdr_tpu.ops.int4 import quantize_tokens_int4

        codes = np.empty((n_docs, (lp + 1) // 2, d), np.uint8)
        scale = np.empty((n_docs, lp), np.float32)
        for s in range(0, n_docs, 50_000):
            e = min(s + 50_000, n_docs)
            x = rng.normal(size=(e - s, lp, d)).astype(np.float32)
            x /= np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12
            codes[s:e], scale[s:e] = quantize_tokens_int4(x)
        out["P_codes4"], out["P_scale"] = codes, scale
    else:
        P = np.empty((n_docs, lp, d), np.float32)
        for s in range(0, n_docs, 50_000):
            e = min(s + 50_000, n_docs)
            x = rng.normal(size=(e - s, lp, d)).astype(np.float32)
            P[s:e] = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        out["P_pad"] = P
    np.savez(path, **out)
    return pathlib.Path(path).stat().st_size / 1e6


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_docs", type=int, default=100_000)
    ap.add_argument("--lp", type=int, default=16)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--dtype", choices=("float32", "int8", "int4"),
                    default="float32")
    ap.add_argument("--keep", default=None, help="reuse/persist the npz here")
    a = ap.parse_args()

    path = a.keep or str(pathlib.Path(tempfile.mkdtemp()) / "big.packed.npz")
    if not pathlib.Path(path).exists():
        mb = write_packed(path, a.n_docs, a.lp, a.dim, a.dtype)
        print(f"[rss] wrote {path}: {mb:.0f} MB", flush=True)

    results = {}
    eng_dtype = a.dtype if a.dtype in ("int8", "int4") else None
    for mode, mm in (("eager", False), ("mmap", True)):
        code = _CHILD.format(repo=REPO, path=path, mmap=mm, dtype=eng_dtype)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=900)
        if out.returncode != 0:
            print(out.stderr[-2000:])
            raise SystemExit(f"{mode} load failed")
        results[mode] = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"[rss] {mode}: {results[mode]}", flush=True)
    # note: on the CPU backend the sharded device buffers themselves are
    # anonymous host memory (~index size), a floor both modes share; on a
    # real TPU host they live in HBM, so mmap's host anon drops to one shard
    # slice. file-backed (mmap) pages evict under pressure, anonymous copies
    # cannot.
    ratio = (results["eager"]["load_peak_rss_mb"]
             / max(results["mmap"]["load_peak_rss_mb"], 1.0))
    print(json.dumps({"file": path, "dtype": a.dtype,
                      "eager": results["eager"], "mmap": results["mmap"],
                      "load_peak_ratio": round(ratio, 2)}))


if __name__ == "__main__":
    main()
