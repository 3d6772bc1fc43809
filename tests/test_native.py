"""Native host-ops (csrc/host_ops.cpp) vs pure-numpy equivalence.

The native library is an optimization layer: every consumer keeps a numpy
fallback, and these tests pin the two bit-identical (probe semantics =
reference model_no_ddp.py:163-187; unique = np.unique; writeback =
cache_manager.py:58-62)."""

from unittest import mock

import numpy as np
import pytest

from cdlrm_tpu.cache.geometry import CacheGeometry
from cdlrm_tpu.cache.host_cache import HostCacheController
from cdlrm_tpu.ops import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host-ops library unavailable"
)


class _ZeroMaster:
    def __init__(self, dim):
        self.dim = dim

    def gather(self, t, idxs):
        # deterministic per-(table, idx) rows so aux_rows can be compared
        out = np.zeros((len(idxs), self.dim), np.float32)
        out[:, 0] = np.asarray(idxs, np.float32) + 1000.0 * t
        return out


def _controller(rng, ln_emb, dim=8, cache_size=64, ways=4, aux=512):
    geo = CacheGeometry.build(ln_emb, dim, cache_size, ways, aux_capacity=aux)
    ctrl = HostCacheController(geo, seed=3)
    uniques = [np.unique(rng.integers(0, n, 300)) for n in ln_emb]
    rows = [rng.random((u.size, dim)).astype(np.float32) for u in uniques]
    ctrl.plan_insert(uniques, rows)
    return geo, ctrl


def test_unique_bitmap_and_radix_match_numpy(rng):
    dense = rng.integers(0, 5_000, 200_000).astype(np.int64)
    assert np.array_equal(native.unique_i64(dense, 5_000), np.unique(dense))
    sparse = rng.integers(0, 10**13, 100_000).astype(np.int64)
    assert np.array_equal(native.unique_i64(sparse, 0), np.unique(sparse))
    # single element / empty
    assert np.array_equal(native.unique_i64(np.array([7], np.int64), 10),
                          np.array([7]))
    assert native.unique_i64(np.zeros(0, np.int64), 10).size == 0


def test_gather_writeback_match_numpy(rng):
    tab = rng.random((1_000, 16)).astype(np.float32)
    idx = rng.integers(0, 1_000, 333).astype(np.int64)
    assert np.array_equal(native.gather_f32(tab, idx), tab[idx])

    ids = rng.choice(1_000, 100, replace=False).astype(np.int64)
    rows = rng.random((100, 16)).astype(np.float32)
    t1 = tab.copy()
    native.writeback_f32(t1, ids, rows, average=False)
    assert np.array_equal(t1[ids], rows)
    t2 = tab.copy()
    native.writeback_f32(t2, ids, rows, average=True)
    assert np.allclose(t2[ids], (tab[ids] + rows) / 2.0)


def test_unique_gather_fused(rng):
    tab = rng.random((2_000, 8)).astype(np.float32)
    idx = rng.integers(0, 2_000, 50_000).astype(np.int64)
    ui, ur = native.unique_gather_f32(idx, tab)
    assert np.array_equal(ui, np.unique(idx))
    assert np.array_equal(ur, tab[ui])


def test_probe_native_matches_numpy_single_index(rng):
    ln_emb = [500, 130, 2_000]
    geo, ctrl = _controller(rng, ln_emb)
    master = _ZeroMaster(geo.dim)
    ls_i = np.stack([rng.integers(0, n, 256) for n in ln_emb]).astype(np.int64)

    got = ctrl.probe(ls_i, master)
    with mock.patch.object(native, "available", return_value=False):
        want = ctrl.probe(ls_i, master)

    assert np.array_equal(got.slots, want.slots)
    assert np.array_equal(got.aux_slots, want.aux_slots)
    assert np.array_equal(got.aux_rows, want.aux_rows)
    assert np.array_equal(got.hit_counts, want.hit_counts)
    assert got.num_lookups == want.num_lookups


def test_probe_native_matches_numpy_masked_multihot(rng):
    ln_emb = [700, 90]
    geo, ctrl = _controller(rng, ln_emb)
    master = _ZeroMaster(geo.dim)
    b, p = 64, 4
    ls_i = np.stack(
        [rng.integers(0, n, (b, p)) for n in ln_emb]
    ).astype(np.int64).reshape(2, -1)
    valid = (rng.random((2, b * p)) < 0.6)

    got = ctrl.probe(ls_i, master, valid=valid)
    with mock.patch.object(native, "available", return_value=False):
        want = ctrl.probe(ls_i, master, valid=valid)

    assert np.array_equal(got.slots, want.slots)
    assert np.array_equal(got.aux_slots, want.aux_slots)
    assert np.array_equal(got.aux_rows, want.aux_rows)
    assert np.array_equal(got.hit_counts, want.hit_counts)
    assert got.num_lookups == want.num_lookups


def test_probe_native_aux_overflow_raises(rng):
    geo = CacheGeometry.build([10_000], 4, 16, 2, aux_capacity=8)
    ctrl = HostCacheController(geo)
    master = _ZeroMaster(4)
    ls_i = rng.integers(0, 10_000, (1, 64)).astype(np.int64)  # ~all miss
    with pytest.raises(ValueError, match="aux capacity"):
        ctrl.probe(ls_i, master)


def test_noncontiguous_inputs(rng):
    """Sliced batch shards (ls_i[:, a:b]) must probe correctly."""
    ln_emb = [400, 400]
    geo, ctrl = _controller(rng, ln_emb)
    master = _ZeroMaster(geo.dim)
    full = np.stack([rng.integers(0, 400, 128) for _ in range(2)]).astype(np.int64)
    shard = full[:, 32:96]
    got = ctrl.probe(shard, master)
    with mock.patch.object(native, "available", return_value=False):
        want = ctrl.probe(np.ascontiguousarray(shard), master)
    assert np.array_equal(got.slots, want.slots)
    assert np.array_equal(got.aux_slots, want.aux_slots)


@pytest.mark.parametrize("bits", [12, 18, 24])
def test_probe_wire_matches_pack_of_probe(rng, bits):
    """probe_wire's fused bitstream == pack_slots(probe output) exactly,
    at every supported width."""
    from cdlrm_tpu.train.step import pack_slots

    ln_emb = [500, 130, 2_000]
    geo, ctrl = _controller(rng, ln_emb)
    master = _ZeroMaster(geo.dim)
    ls_i = np.stack([rng.integers(0, n, 256) for n in ln_emb]).astype(np.int64)

    w = ctrl.probe_wire(ls_i, master, bits=bits)
    p = ctrl.probe(ls_i, master)
    assert np.array_equal(
        w.slots, pack_slots(p.slots, geo.table_offsets, geo.trash_row, bits)
    )
    assert np.array_equal(w.aux_slots, p.aux_slots)
    assert np.array_equal(w.aux_rows, p.aux_rows)
    assert np.array_equal(w.hit_counts, p.hit_counts)

    # masked multi-hot: sentinel for invalid positions
    b, pp = 64, 3
    flat = np.stack([rng.integers(0, n, (b, pp)) for n in ln_emb]).astype(np.int64).reshape(3, -1)
    valid = rng.random((3, b * pp)) < 0.5
    w2 = ctrl.probe_wire(flat, master, bits=bits, valid=valid)
    p2 = ctrl.probe(flat, master, valid=valid)
    assert np.array_equal(
        w2.slots, pack_slots(p2.slots, geo.table_offsets, geo.trash_row, bits)
    )


@pytest.mark.parametrize("bits", [10, 17, 24])
def test_wire_roundtrip_unpack(rng, bits):
    """pack_slots -> device _unpack_slots is the identity on global ids at
    every supported bit width."""
    import jax.numpy as jnp

    from cdlrm_tpu.train.step import _unpack_slots, pack_slots, wire_width

    geo = CacheGeometry.build([300, 700], 4, 32, 2, aux_capacity=16)
    rows = geo.ways * geo.sets + geo.aux_capacity
    assert wire_width(int(rows.max()) - 1) <= bits
    n = 128
    slots = np.stack([
        (geo.table_offsets[t] + rng.integers(0, rows[t], n)).astype(np.int32)
        for t in range(2)
    ])
    slots[0, 0] = geo.trash_row
    wire = pack_slots(slots, geo.table_offsets, geo.trash_row, bits)
    back = np.asarray(_unpack_slots(
        jnp.asarray(wire), geo.table_offsets, geo.trash_row, bits, n
    ))
    assert np.array_equal(back, slots)


@pytest.mark.parametrize("bits", [9, 13, 18, 24])
def test_pack_bits_matches_pack_slots(rng, bits):
    """The native 1-D bitstream emitter == pack_slots byte-for-byte (the
    dedup unique wire is packed natively; the device unpack must not care
    which host wrote it)."""
    from cdlrm_tpu.train.step import pack_slots, wire_bytes

    n = 1000
    vals = rng.integers(0, (1 << bits) - 1, n).astype(np.int64)
    vals[rng.random(n) < 0.2] = -1  # sentinel marks
    want = pack_slots(vals[None, :], np.zeros(1, np.int64), -1, bits)[0]
    got = native.pack_bits(vals, bits, wire_bytes(n, bits))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("masked", [False, True])
def test_probe_dedup_native_matches_numpy(rng, masked):
    """The fused native probe+dedup (csrc cdlrm_probe_batch_dedup) must be
    bit-identical to the numpy fallback: same first-seen ranks, same unique
    lists, same aux assembly — with duplicate-heavy streams so coalescing is
    actually exercised."""
    ln_emb = [40, 15, 90]
    geo, ctrl = _controller(rng, ln_emb, cache_size=16, ways=2, aux=512)
    master = _ZeroMaster(geo.dim)
    n = 256
    ls_i = np.stack([rng.integers(0, min(n_t, 12), n) for n_t in ln_emb]).astype(
        np.int64
    )  # tiny id range -> heavy duplication
    valid = (rng.random((3, n)) < 0.6) if masked else None
    inv_bits = 10

    got = ctrl.probe_dedup(ls_i, master, inv_bits, valid=valid)
    with mock.patch.object(native, "available", return_value=False):
        want = ctrl.probe_dedup(ls_i, master, inv_bits, valid=valid)
    assert np.array_equal(got.inv_wire, want.inv_wire)
    assert np.array_equal(got.uniq, want.uniq)
    assert np.array_equal(got.uniq_counts, want.uniq_counts)
    assert np.array_equal(got.aux_slots, want.aux_slots)
    assert np.array_equal(got.aux_rows, want.aux_rows)
    assert np.array_equal(got.hit_counts, want.hit_counts)
    assert got.num_lookups == want.num_lookups
    # coalescing really happened
    assert got.uniq.size < (np.sum(valid) if masked else ls_i.size)

    # decode agrees with the plain probe: rank stream expands back to the
    # plain path's slot resolution
    import jax.numpy as jnp

    from cdlrm_tpu.train import step as step_lib

    pr = ctrl.probe(ls_i, master, valid=valid)
    uniq_bits = step_lib.wire_width(
        int((geo.ways * geo.sets + geo.aux_capacity).max()) - 1
    )
    ub = 1 + got.uniq.size + 3  # arbitrary padding
    vals = np.full(ub, -1, np.int64)
    vals[1 : 1 + got.uniq.size] = got.uniq.astype(np.int64) - np.repeat(
        geo.table_offsets, got.uniq_counts
    )
    uniq_wire = step_lib.pack_slots(
        vals[None, :], np.zeros(1, np.int64), -1, uniq_bits
    )[0]
    uniq_slots, ginv = step_lib._decode_dedup(
        jnp.asarray(got.inv_wire), jnp.asarray(uniq_wire),
        jnp.asarray(got.uniq_counts.astype(np.int32)), geo, inv_bits,
        uniq_bits, n,
    )
    expanded = np.asarray(uniq_slots)[np.asarray(ginv)].reshape(3, n)
    assert np.array_equal(expanded, pr.slots)


@pytest.mark.parametrize("bits", list(range(9, 25)))
def test_wire_roundtrip_every_width(bits):
    """Property test at EVERY supported width, bits=9 boundary included, with
    a large n on the numpy pack path: pack_slots writes via out[:, byte] |=
    fancy indexing, which silently drops bits if one pack pass ever hits the
    same byte twice — the bits >= 9 floor is what guarantees it never does
    (train/step.py wire_width). Adversarial content: all-sentinel, the
    maximum local slot, and dense coverage of the local id space."""
    import jax.numpy as jnp

    from cdlrm_tpu.train.step import _unpack_slots, pack_slots

    rng = np.random.default_rng(bits)
    max_local = (1 << bits) - 2  # sentinel is all-ones at this width
    t_count, n = 3, 4096
    offsets = np.array([0, max_local + 1, 2 * (max_local + 1)], np.int64)
    trash = int(3 * (max_local + 1))
    local = rng.integers(0, max_local + 1, (t_count, n)).astype(np.int64)
    local[0, :7] = max_local  # boundary value
    slots = (local + offsets[:, None]).astype(np.int32)
    slots[1, 100:200] = trash  # sentinel runs
    wire = pack_slots(slots, offsets, trash, bits)
    back = np.asarray(_unpack_slots(jnp.asarray(wire), offsets, trash, bits, n))
    assert np.array_equal(back, slots)


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("slot_map", [False, True])
@pytest.mark.parametrize("sort", [False, True])
def test_probe_dedup_raw_native_matches_numpy(rng, masked, slot_map, sort):
    """The UNPACKED dedup wire (probe_dedup_raw: inv_bits=32 makes the
    bitstream a raw little-endian int32 array) must be bit-identical across
    all four host paths: occupancy-walk / direct-map x native / numpy."""
    ln_emb = [40, 15, 90]
    geo, ctrl = _controller(rng, ln_emb, cache_size=16, ways=2, aux=512)
    master = _ZeroMaster(geo.dim)
    if slot_map:
        ctrl = HostCacheController(
            geo, seed=0, ln_emb=np.asarray(ln_emb), slot_map=True
        )
    n = 256
    ls_i = np.stack(
        [rng.integers(0, min(n_t, 12), n) for n_t in ln_emb]
    ).astype(np.int64)
    valid = (rng.random((3, n)) < 0.6) if masked else None

    # seed some residency so hits + misses both flow
    win = [np.unique(ls_i[t][:64]) for t in range(3)]
    ctrl.plan_insert(win, [np.zeros((u.size, geo.dim), np.float32) for u in win])

    # sort=True additionally pins csrc cdlrm_sort_dedup_wire against the
    # numpy stable-argsort remap (ascending segments, permuted ranks)
    got = ctrl.probe_dedup_raw(ls_i, master, valid=valid, sort=sort)
    with mock.patch.object(native, "available", return_value=False):
        want = ctrl.probe_dedup_raw(ls_i, master, valid=valid, sort=sort)
    if sort:
        assert np.all(np.diff(got.uniq) > 0)
    assert got.inv_wire.dtype == want.inv_wire.dtype == np.int32
    assert np.array_equal(got.inv_wire, want.inv_wire)
    assert np.array_equal(got.uniq, want.uniq)
    assert np.array_equal(got.uniq_counts, want.uniq_counts)
    assert np.array_equal(got.aux_slots, want.aux_slots)
    # masked lanes carry the -1 sentinel
    if masked:
        assert (got.inv_wire[~valid] == -1).all()


@pytest.mark.parametrize("slot_map", [False, True])
def test_masked_lanes_exempt_from_range_check(rng, slot_map):
    """Ids in MASKED padding lanes carry no input contract: a stream whose
    masked lanes hold negative / out-of-int32-range garbage must be accepted
    identically by the native and numpy probe paths (the kernels skip masked
    lanes without gathering; round-3 advisor finding on map_probe_batch_dedup
    checking the full ls_i)."""
    ln_emb = [40, 15, 90]
    geo, ctrl = _controller(rng, ln_emb, cache_size=16, ways=2, aux=512)
    if slot_map:
        ctrl = HostCacheController(
            geo, seed=0, ln_emb=np.asarray(ln_emb), slot_map=True
        )
    master = _ZeroMaster(geo.dim)
    n = 64
    ls_i = np.stack(
        [rng.integers(0, min(n_t, 12), n) for n_t in ln_emb]
    ).astype(np.int64)
    valid = rng.random((3, n)) < 0.6
    ls_garbage = ls_i.copy()
    ls_garbage[~valid] = -(1 << 40)  # garbage only where masked

    for probe in (ctrl.probe_dedup_raw, ctrl.probe):
        got = probe(ls_garbage, master, valid=valid)
        clean = probe(ls_i, master, valid=valid)
        with mock.patch.object(native, "available", return_value=False):
            want = probe(ls_garbage, master, valid=valid)
        for name in ("aux_slots", "hit_counts"):
            assert np.array_equal(getattr(got, name), getattr(want, name))
            assert np.array_equal(getattr(got, name), getattr(clean, name))


def test_block_union_ranks_match_numpy(rng):
    """csrc cdlrm_block_union/_ranks/_reset vs the numpy bitmap
    formulation in trainer._build_block_union: sorted union, per-step
    rank rows (aux/trash -> p_trash), and the lazy map reset must be
    bit-identical — the two paths are interchangeable per
    CLAUDE.md's native==fallback invariant."""
    if not native.available():
        pytest.skip("native library unavailable")
    n_rows = 5000
    real = np.ones(n_rows, bool)
    real[4000:] = False          # "aux/trash" tail
    real_bits = native.mask_bits(real.astype(np.uint8))
    # pin the word layout itself against a pure-numpy packbits derivation
    want_bits = np.packbits(
        np.pad(real, (0, (-n_rows) % 64)), bitorder="little"
    ).view(np.uint64)
    np.testing.assert_array_equal(real_bits, want_bits)
    n_steps, ub, p_trash, base = 4, 256, 1023, 1
    step_lists = [
        np.unique(rng.integers(0, n_rows, rng.integers(10, 200)))
        .astype(np.int32)
        for _ in range(n_steps)
    ]
    cat = np.concatenate(step_lists)
    off = np.zeros(n_steps + 1, np.int64)
    np.cumsum([s.size for s in step_lists], out=off[1:])

    # numpy formulation (the trainer's fallback path)
    present = np.zeros(n_rows, bool)
    present[cat] = True
    present &= real
    union_np = np.flatnonzero(present)
    rmap_np = np.full(n_rows, -1, np.int32)
    rmap_np[union_np] = np.arange(union_np.size, dtype=np.int32)
    rows_np = np.full((n_steps, ub), p_trash, np.int32)
    for i, u in enumerate(step_lists):
        r = rmap_np[u]
        rows_np[i, base: base + u.size] = np.where(r < 0, p_trash, r)

    # native
    rmap = np.full(n_rows, -1, np.int32)
    union = native.block_union(cat, real_bits, n_rows, rmap)
    np.testing.assert_array_equal(union, union_np)
    rows = native.block_ranks(cat, off, rmap, p_trash, ub, base)
    np.testing.assert_array_equal(rows, rows_np)
    # in-place strided form (the trainer's call shape: a [:, k, :] slice
    # of the [n_steps, n_local, ub] staging array)
    staged = np.zeros((n_steps, 3, ub), np.int32)
    native.block_ranks(cat, off, rmap, p_trash, ub, base, out=staged[:, 1])
    np.testing.assert_array_equal(staged[:, 1], rows_np)
    assert not staged[:, 0].any() and not staged[:, 2].any()
    native.block_union_reset(union, rmap)
    assert (rmap == -1).all()
    # out-of-range slots must raise, not scribble
    bad = cat.copy()
    bad[0] = n_rows
    with pytest.raises(ValueError):
        native.block_union(bad, real_bits, n_rows, rmap)
    assert (rmap == -1).all()
    # int64 input: accepted when in range (range-checked BEFORE the
    # narrowing cast — a wrap like 2**32+5 -> 5 must not pass silently)
    u64 = native.block_union(cat.astype(np.int64), real_bits, n_rows, rmap)
    np.testing.assert_array_equal(u64, union_np)
    native.block_union_reset(u64, rmap)
    wide = cat.astype(np.int64)
    wide[0] = 2**32 + 5
    with pytest.raises(IndexError):
        native.block_union(wide, real_bits, n_rows, rmap)
    with pytest.raises(IndexError):
        native.block_ranks(wide, off, rmap, p_trash, ub, base)
    assert (rmap == -1).all()
