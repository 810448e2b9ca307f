"""Multi-host path tests (VERDICT item 7; SURVEY §7 step 6).

The reference never initializes torch.distributed (SURVEY §5.8); our
multi-host layer is mmde_tpu.parallel.distributed. Covered here:
  * host_shard partitioning semantics (unit, mocked process topology);
  * per-host sharded dataset loading built on host_shard;
  * a REAL 2-process jax.distributed.initialize on localhost (CPU
    backend, subprocess-spawned) exercising process_count and the
    process_allgather-based metric reduction.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from mmde_tpu.parallel import distributed as dist

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestHostShard:
    def _mock(self, monkeypatch, count, index):
        monkeypatch.setattr(jax, "process_count", lambda: count)
        monkeypatch.setattr(jax, "process_index", lambda: index)

    def test_partition_covers_dataset(self, monkeypatch):
        n = 103
        seen = []
        for i in range(4):
            self._mock(monkeypatch, 4, i)
            lo, hi = dist.host_shard(n)
            seen.extend(range(lo, hi))
        assert sorted(seen) == list(range(n))

    def test_single_host_identity(self, monkeypatch):
        self._mock(monkeypatch, 1, 0)
        assert dist.host_shard(7) == (0, 7)

    def test_per_host_loader_split(self, monkeypatch):
        """Per-host sharded input loading: each host iterates only its
        shard; the union covers every sample exactly once."""
        from mmde_tpu.data.loader import DataLoader

        class Tiny:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                return {"x": np.full((2,), i, np.float32)}

        ds = Tiny()
        got = []
        for i in range(2):
            self._mock(monkeypatch, 2, i)
            lo, hi = dist.host_shard(len(ds))

            class Shard:
                def __len__(self):
                    return hi - lo

                def __getitem__(self, k):
                    return ds[lo + k]

            for batch in DataLoader(Shard(), 1, shuffle=False,
                                    num_workers=0):
                got.append(int(batch["x"][0, 0]))
        assert sorted(got) == list(range(10))


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid, n, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, {repo!r})
from mmde_tpu.parallel import distributed as dist
dist.initialize(coordinator_address=addr, num_processes=n, process_id=pid)
assert jax.process_count() == n, jax.process_count()
assert jax.process_index() == pid
m = dist.all_mean_scalar(float(pid))
assert abs(m - (n - 1) / 2.0) < 1e-9, m
lo, hi = dist.host_shard(10)
print(f"OK pid={{pid}} shard={{lo}}:{{hi}} mean={{m}}", flush=True)
"""


def test_two_process_initialize_and_allgather(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", addr],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process distributed test timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert "OK pid=" in out
    shards = sorted(o.split("shard=")[1].split()[0] for _, o, _ in outs)
    assert shards == ["0:5", "5:10"]
