"""2-process jax.distributed smoke: sharded eval loader + host-side
result allgather + make_array_from_process_local_data.

The reference has no multi-process story at all (torch DataParallel is
single-process, /root/reference/train.py:62); this locks down odtpu's
multi-host contract: each process evaluates a disjoint 1/world slice of
the test set and still reports the identical full-set mAP.
"""

import os
import socket
import subprocess
import sys

import numpy as np

from odtpu.parallel import allgather_host_rows
from synth import make_voc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_allgather_host_rows_single_process_identity():
    rows = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = allgather_host_rows(rows)
    assert np.array_equal(out, rows)
    assert allgather_host_rows(np.zeros((0, 7), np.float32)).shape == (0, 7)


def test_two_process_sharded_eval(tmp_path):
    make_voc(str(tmp_path / "VOCdevkit"), n_images=6, seed=11)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    env["PYTHONPATH"] = REPO + os.pathsep + os.path.join(REPO, "tests")
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             "--rank", str(rank), "--world", "2", "--coord", coord,
             "--root", str(tmp_path / "VOCdevkit"),
             "--out", str(tmp_path / f"out{rank}")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"MULTIHOST_OK rank={rank} mAP=1.0000" in out, out
