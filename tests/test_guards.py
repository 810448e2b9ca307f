"""Loud-failure guards: invariants that would otherwise corrupt results
silently (VERDICT r3 weak #5, ADVICE r3 items)."""
import os
import time

import numpy as np
import pytest

from mmde_tpu.nn import swin_v2 as sw
from mmde_tpu.ops import window_attention_packed as wap
from mmde_tpu.utils import cache as cache_mod


def test_bylayer_coords_table_rejects_degenerate_pretrain_window():
    # pretrain_window_size <= 1 with a _bylayer table used to emit NaN/inf
    # coords under a RuntimeWarning; now a hard error.
    with pytest.raises(ValueError, match="pretrain_window_size"):
        sw.relative_coords_table((4, 4), pretrain_window_size=1,
                                 table_type="norm8_log_bylayer")
    with pytest.raises(ValueError, match="pretrain_window_size"):
        sw.relative_coords_table((4, 4), pretrain_window_size=1,
                                 table_type="linear_bylayer")
    # -1 ("unset") stays legal: the reference divides by -2 to finite effect
    for pws in (2, -1):
        t = sw.relative_coords_table((4, 4), pretrain_window_size=pws,
                                     table_type="norm8_log_bylayer")
        assert np.isfinite(t).all()


def test_grid_mode_typo_rejected():
    import jax.numpy as jnp
    qkv = jnp.zeros((2, 4, 3 * 128), jnp.float32)
    ls = jnp.zeros((4,), jnp.float32)
    bias = jnp.zeros((1, 8, 4 * 8), jnp.float32)
    with pytest.raises(ValueError, match="grid_mode"):
        wap.cosine_window_attention_packed(qkv, ls, bias, num_heads=4,
                                           grid_mode="bias-resident")


def test_remat_policy_typo_rejected():
    # a typo like 'mlponly' used to silently fall back to whole-block
    # remat (numerically identical, ~15% slower) — now a hard error.
    import jax
    import jax.numpy as jnp
    layer = sw.BasicLayer(dim=32, depth=1, num_heads=2, window_size=4,
                          use_checkpoint=True, remat_policy="mlponly",
                          pretrain_window_size=2)
    x = jnp.zeros((1, 8, 8, 32), jnp.float32)
    with pytest.raises(ValueError, match="remat_policy"):
        layer.init(jax.random.PRNGKey(0), x)


def test_prune_cache_keeps_read_only_entries_in_active_dirs(tmp_path):
    # JAX cache hits never bump mtime: an entry older than max_age_days in
    # a dir that also has fresh writes must survive (stable daily-read
    # model). Only a dir whose NEWEST entry is past the cutoff is stale.
    base = tmp_path / "jc"
    plat = base / "tpu-9.9.9"
    plat.mkdir(parents=True)
    old = plat / "stable_model_entry"
    old.write_bytes(b"x" * 100)
    os.utime(old, (time.time() - 30 * 86400,) * 2)
    fresh = plat / "fresh_entry"
    fresh.write_bytes(b"x" * 100)
    cache_mod.prune_cache(str(base), max_bytes=10_000, max_age_days=14)
    assert old.exists() and fresh.exists()


def test_prune_cache_bounds_and_layouts(tmp_path):
    base = tmp_path / "jc"
    plat = base / "tpu-9.9.9"
    plat.mkdir(parents=True)
    # pre-round-3 loose entry at base root: always removed
    (base / "jit_old-deadbeef-cache").write_bytes(b"x" * 100)
    # age-expired entry in a stale fingerprint dir: removed, dir swept
    stale = base / "oldfingerprint"
    stale.mkdir()
    old = stale / "entry"
    old.write_bytes(b"x" * 100)
    os.utime(old, (time.time() - 30 * 86400,) * 2)
    # fresh entries beyond the size cap: oldest-mtime pruned first
    now = time.time()
    for i in range(4):
        p = plat / f"e{i}"
        p.write_bytes(b"x" * 1000)
        os.utime(p, (now - (4 - i) * 60,) * 2)
    cache_mod.prune_cache(str(base), max_bytes=2500, max_age_days=14)
    assert not (base / "jit_old-deadbeef-cache").exists()
    assert not stale.exists()
    kept = sorted(f.name for f in plat.iterdir())
    assert kept == ["e2", "e3"]          # newest two fit the 2500-byte cap
