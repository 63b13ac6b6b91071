"""Sequential-oracle tests of voxel-map mutation semantics.

`OracleIVM` is a direct numpy port of the reference's sequential insert
loop (ann/incremental_voxelmap.hpp:55-92 + ann/flat_container.hpp:43-58):
per-point voxel lookup, LRU stamping with the PRE-increment counter,
min-dist dedup against the voxel's current occupants, per-voxel point
cap in arrival order, and post-increment LRU eviction every
lru_clear_cycle inserts. The tests pin the TPU implementation to these
semantics:

  * one-point-per-insert streams match the oracle EXACTLY (the batched
    within-scan dedup approximation never triggers)
  * batched inserts match up to a quantified divergence bound coming
    only from the within-batch fine-grid dedup approximation
  * LRU eviction happens on exactly the reference's insert index
    (guards the pre/post-increment stamp distinction)
  * both capacity-overflow policies (IVM drops highest-key rows, GVM
    keeps all within capacity else highest-key merged rows)
"""

import numpy as np
import pytest
import jax.numpy as jnp

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.models.voxelmap import GaussianVoxelMap, IncrementalVoxelMap


class OracleIVM:
    """Reference-sequential IncrementalVoxelMap<FlatContainer> in numpy."""

    def __init__(self, leaf, cell_cap=10, min_sq=0.01, horizon=100, cycle=10):
        self.leaf = leaf
        self.cell_cap = cell_cap
        self.min_sq = min_sq
        self.horizon = horizon
        self.cycle = cycle
        self.counter = 0
        self.voxels = {}  # coord tuple -> {"lru": int, "pts": [xyz]}

    def insert(self, pts):
        for p in np.asarray(pts, dtype=np.float64):
            coord = tuple(np.floor(p / self.leaf).astype(np.int64))
            v = self.voxels.setdefault(coord, {"lru": self.counter, "pts": []})
            # Reference stamps for EVERY point, even ones add() rejects
            # (incremental_voxelmap.hpp:69-71).
            v["lru"] = self.counter
            if len(v["pts"]) < self.cell_cap and all(
                np.sum((p - e) ** 2) >= self.min_sq for e in v["pts"]
            ):
                v["pts"].append(p)
        self.counter += 1
        if self.counter % self.cycle == 0:
            self.voxels = {
                c: v
                for c, v in self.voxels.items()
                if v["lru"] + self.horizon >= self.counter
            }

    def size(self):
        return sum(len(v["pts"]) for v in self.voxels.values())

    def points_by_voxel(self):
        return {c: np.asarray(v["pts"]) for c, v in self.voxels.items() if v["pts"]}


def _ivm_points_by_voxel(vm):
    keys = np.asarray(vm.point_keys)
    pts = np.asarray(vm.points_flat())
    valid = np.asarray(vm.valid_points_mask())
    out = {}
    off = 1 << 20
    for k, p in zip(keys[valid], pts[valid]):
        x = int(k & ((1 << 21) - 1)) - off
        y = int((k >> 21) & ((1 << 21) - 1)) - off
        z = int((k >> 42) & ((1 << 21) - 1)) - off
        out.setdefault((x, y, z), []).append(p[:3])
    return {c: np.asarray(v) for c, v in out.items()}


def _match_voxel_contents(got, want, atol=1e-5):
    assert set(got) == set(want), (
        f"voxel sets differ: extra={set(got)-set(want)}, "
        f"missing={set(want)-set(got)}"
    )
    for c in want:
        g, w = got[c], want[c]
        assert len(g) == len(w), f"voxel {c}: {len(g)} vs oracle {len(w)}"
        # arrival order is preserved by both
        assert np.allclose(g, w, atol=atol), f"voxel {c} contents differ"


def test_ivm_single_point_stream_matches_oracle_exactly():
    """One point per insert call ⇒ no within-batch approximation is in
    play, so the implementation must match the sequential reference
    insert loop exactly — including the min-dist rejection against
    existing occupants of the SAME voxel only."""
    rng = np.random.default_rng(7)
    pts = rng.uniform(-2, 2, size=(300, 3))
    # Densify so dedup + cap both trigger often.
    pts = np.concatenate([pts, pts[:150] + rng.normal(scale=0.05, size=(150, 3))])
    oracle = OracleIVM(1.0, cell_cap=5, min_sq=0.04, horizon=10**9, cycle=10**9)
    vm = IncrementalVoxelMap.empty(
        1.0, capacity=2048, dtype=jnp.float64, cell_capacity=5,
        min_sq_dist_in_cell=0.04, lru_horizon=10**9, lru_clear_cycle=10**9,
    )
    for p in pts:
        oracle.insert(p[None, :])
        vm = vm.insert(PointCloud.from_points(p[None, :]))
    assert int(vm.num_points()) == oracle.size()
    _match_voxel_contents(_ivm_points_by_voxel(vm), oracle.points_by_voxel())


def test_ivm_batch_insert_divergence_bounded():
    """Whole-scan batched inserts may deviate from the sequential oracle
    only through the within-batch fine-grid dedup approximation (a
    same-batch near pair straddling two fine cells is kept where the
    oracle drops one — and, more rarely, a same-cell pair slightly
    beyond min_dist is dropped where the oracle keeps it). The stored
    point count must stay within 5% of the oracle on a heavily
    duplicated scan; dedup against OLD occupants is exact, so
    across-insert behavior carries no approximation at all (see
    test_ivm_single_point_stream_matches_oracle_exactly)."""
    rng = np.random.default_rng(11)
    oracle = OracleIVM(1.0, cell_cap=10, min_sq=0.01, horizon=10**9, cycle=10**9)
    vm = IncrementalVoxelMap.empty(
        1.0, capacity=8192, dtype=jnp.float64, cell_capacity=10,
        min_sq_dist_in_cell=0.01, lru_horizon=10**9, lru_clear_cycle=10**9,
    )
    for _ in range(5):
        scan = rng.uniform(-4, 4, size=(1000, 3))
        scan = np.concatenate(
            [scan, scan[:300] + rng.normal(scale=0.03, size=(300, 3))]
        )
        oracle.insert(scan)
        vm = vm.insert(PointCloud.from_points(scan))
    got, want = int(vm.num_points()), oracle.size()
    assert abs(got - want) <= 0.05 * want, (got, want)
    # Voxel sets must agree exactly (dedup never drops the first point
    # of a voxel).
    assert set(_ivm_points_by_voxel(vm)) == set(oracle.points_by_voxel())


@pytest.mark.smoke
def test_ivm_lru_eviction_uses_preincrement_stamp():
    """Reference timing: a voxel stamped at insert #t (counter value t)
    is evicted at the first clear where t + horizon < counter, with the
    counter already incremented (incremental_voxelmap.hpp:63,70,74-79).
    horizon=5, cycle=2: voxel A stamped 0 must survive the clears at
    counter 2 and 4 and die exactly at counter 6 (after the 6th insert).
    A post-increment stamp (A stamped 1) would keep it through counter 6
    — this test pins the distinction."""
    far = PointCloud.from_points(np.array([[50.5, 0.5, 0.5]]))
    near = PointCloud.from_points(np.array([[0.5, 0.5, 0.5]]))

    def far_alive(m):
        _, _, found = m.nearest_neighbor_search(jnp.asarray([[50.5, 0.5, 0.5]]))
        return bool(found[0])

    vm = IncrementalVoxelMap.empty(
        1.0, capacity=64, dtype=jnp.float64, lru_horizon=5, lru_clear_cycle=2
    )
    vm = vm.insert(far)  # insert #0 → A stamped 0, counter 1
    for i in range(1, 6):
        vm = vm.insert(near)  # counter i+1
        alive = far_alive(vm)
        if i < 5:
            assert alive, f"A evicted too early (counter={i+1})"
        else:
            assert not alive, "A must die at counter 6 (0 + 5 < 6)"


def test_gvm_lru_eviction_uses_preincrement_stamp():
    """Same boundary for the Gaussian map."""
    def cl(p):
        c = PointCloud.from_points(np.asarray(p, np.float64))
        return c.replace(covs=jnp.broadcast_to(jnp.eye(3), (len(p), 3, 3)))

    far, near = cl([[50.5, 0.5, 0.5]]), cl([[0.5, 0.5, 0.5]])
    vm = GaussianVoxelMap.empty(
        1.0, capacity=64, dtype=jnp.float64, lru_horizon=5, lru_clear_cycle=2
    )
    vm = vm.insert(far)
    for i in range(1, 6):
        vm = vm.insert(near)
        _, _, found = vm.nearest_neighbor_search(jnp.asarray([[50.5, 0.5, 0.5]]))
        alive = bool(found[0])
        if i < 5:
            assert alive, f"A evicted too early (counter={i+1})"
        else:
            assert not alive, "A must die at counter 6 (0 + 5 < 6)"


def test_ivm_cell_cap_keeps_first_arrivals():
    """Arrival order decides which points a full cell keeps
    (flat_container.hpp:43-51): the first `cap` (dedup-passing) points."""
    rng = np.random.default_rng(13)
    base = np.array([0.5, 0.5, 0.5])
    offs = rng.normal(scale=0.2, size=(20, 3))
    pts = np.clip(base + offs, 0.02, 0.98)
    vm = IncrementalVoxelMap.empty(
        1.0, capacity=32, dtype=jnp.float64, cell_capacity=6,
        min_sq_dist_in_cell=0.0,
    )
    vm = vm.insert(PointCloud.from_points(pts[:4]))   # 4 points
    vm = vm.insert(PointCloud.from_points(pts[4:]))   # 2 more fit
    assert int(vm.num_points()) == 6
    stored = np.asarray(vm.points_flat())[np.asarray(vm.valid_points_mask())]
    assert np.allclose(stored[:, :3], pts[:6], atol=1e-12)


def test_ivm_capacity_overflow_drops_highest_key_new_voxels():
    """Documented IVM overflow policy (slot-table design): once all
    voxel slots are taken, NEW voxels are dropped from the highest-key
    end; existing voxels are never displaced."""
    rng = np.random.default_rng(17)
    pts = (rng.permutation(64)[:, None] * np.array([1.0, 0, 0]))[None].reshape(64, 3)
    pts = pts + 0.5
    # cell_capacity=1 → exactly 32 voxel slots for 64 distinct voxels.
    vm = IncrementalVoxelMap.empty(
        1.0, capacity=32, dtype=jnp.float64, cell_capacity=1,
        min_sq_dist_in_cell=0.0,
    )
    vm = vm.insert(PointCloud.from_points(pts))
    assert int(vm.size()) == 32
    valid = np.asarray(vm.valid_points_mask())
    assert valid.sum() == 32
    stored_x = np.sort(np.asarray(vm.points_flat())[valid][:, 0])
    # lowest 32 voxel keys = lowest 32 x coordinates here
    assert np.allclose(stored_x, np.sort(pts[:, 0])[:32], atol=1e-12)
    # existing voxels survive a later overflowing insert untouched
    far = PointCloud.from_points(np.array([[100.5, 0.5, 0.5]]))
    vm2 = vm.insert(far)
    assert int(vm2.size()) == 32
    stored_x2 = np.sort(
        np.asarray(vm2.points_flat())[np.asarray(vm2.valid_points_mask())][:, 0]
    )
    assert np.allclose(stored_x2, stored_x, atol=1e-12)


def test_gvm_capacity_overflow_drops_highest_key_voxels():
    """Documented GVM overflow policy (mirrors the IVM): merged voxels
    beyond capacity are dropped from the highest-key end."""
    rng = np.random.default_rng(19)
    n = 48
    pts = np.arange(n)[:, None] * np.array([1.0, 0, 0]) + 0.5
    covs = np.broadcast_to(np.eye(3), (n, 3, 3))
    cloud = PointCloud.from_points(pts).replace(covs=jnp.asarray(covs))
    vm = GaussianVoxelMap.empty(1.0, capacity=32, dtype=jnp.float64)
    vm = vm.insert(cloud)
    assert int(vm.num_voxels) == 32
    means = np.asarray(vm.means)[:32, 0]
    assert np.allclose(np.sort(means), pts[:32, 0], atol=1e-12)


def test_ivm_insert_counter_and_refresh():
    """Inserting into an existing voxel refreshes its stamp so it
    survives a later clear (the near voxel in the LRU tests), and an
    insert whose every point is rejected by dedup STILL refreshes the
    stamp (reference stamps before add — incremental_voxelmap.hpp:69-71)."""
    vm = IncrementalVoxelMap.empty(
        1.0, capacity=64, dtype=jnp.float64, lru_horizon=3,
        lru_clear_cycle=1, min_sq_dist_in_cell=0.01,
    )
    p = PointCloud.from_points(np.array([[0.5, 0.5, 0.5]]))
    vm = vm.insert(p)  # stamp 0
    elsewhere = PointCloud.from_points(np.array([[10.5, 0.5, 0.5]]))
    for i in range(1, 3):
        # same point again: rejected by dedup, but stamp refreshes
        vm = vm.insert(p)
    for i in range(3):
        vm = vm.insert(elsewhere)
    # stamp of voxel A was refreshed at insert #2 (stamp 2); horizon 3:
    # dies when 2 + 3 < counter → counter 6 = after 6th insert. We've
    # done 6 inserts, so A is exactly now evicted.
    _, _, found = vm.nearest_neighbor_search(jnp.asarray([[0.5, 0.5, 0.5]]))
    assert not bool(found[0])
    # ...but with one fewer filler insert it survives.
    vm2 = IncrementalVoxelMap.empty(
        1.0, capacity=64, dtype=jnp.float64, lru_horizon=3,
        lru_clear_cycle=1, min_sq_dist_in_cell=0.01,
    )
    vm2 = vm2.insert(p)
    for i in range(1, 3):
        vm2 = vm2.insert(p)
    for i in range(2):
        vm2 = vm2.insert(elsewhere)
    _, _, found = vm2.nearest_neighbor_search(jnp.asarray([[0.5, 0.5, 0.5]]))
    assert bool(found[0])


def test_ivm_slots_freed_by_eviction_are_reused():
    """Slot-table-specific: eviction must return slots to the free pool so
    a full map can keep tracking new space (the slot allocator scans for
    INVALID_KEY slots — a stale occ/key would leak capacity forever)."""
    vm = IncrementalVoxelMap.empty(
        1.0, capacity=8, dtype=jnp.float64, cell_capacity=1,
        lru_horizon=2, lru_clear_cycle=1, min_sq_dist_in_cell=0.0,
    )
    V = vm.voxel_capacity  # rounded to 8

    def block(x0):
        # V distinct voxels starting at x = x0
        xs = (np.arange(V) + x0)[:, None] * np.array([1.0, 0, 0]) + 0.5
        return PointCloud.from_points(xs)

    vm = vm.insert(block(0))  # fills every slot
    assert int(vm.num_voxels) == V
    # Age the original block out (horizon 2, clear cycle 1), while
    # inserting fresh blocks that need the freed slots.
    for step in range(1, 5):
        vm = vm.insert(block(100 * step))
    assert int(vm.num_voxels) <= V
    # The newest block must be fully present — impossible unless evicted
    # slots were reallocated.
    q = (np.arange(V) + 400)[:, None] * np.array([1.0, 0, 0]) + 0.5
    _, _, found = vm.nearest_neighbor_search(jnp.asarray(q))
    assert bool(np.all(np.asarray(found))), np.asarray(found)
    # ...and the first block must be gone.
    q0 = (np.arange(V))[:, None] * np.array([1.0, 0, 0]) + 0.5
    _, _, found0 = vm.nearest_neighbor_search(jnp.asarray(q0))
    assert not bool(np.any(np.asarray(found0)))


def test_gvm_slots_freed_by_eviction_are_reused():
    """Same reuse property for the Gaussian map's slot allocator."""
    from small_gicp_tpu.models.voxelmap import GaussianVoxelMap

    vm = GaussianVoxelMap.empty(
        1.0, capacity=8, dtype=jnp.float64, lru_horizon=2, lru_clear_cycle=1
    )
    V = vm.capacity

    def block(x0):
        xs = (np.arange(V) + x0)[:, None] * np.array([1.0, 0, 0]) + 0.5
        c = np.tile(np.eye(3) * 1e-3, (V, 1, 1))
        return PointCloud.from_points(xs).replace(covs=jnp.asarray(c))

    vm = vm.insert(block(0))
    assert int(vm.num_voxels) == V
    for step in range(1, 5):
        vm = vm.insert(block(100 * step))
    assert int(vm.num_voxels) <= V
    q = (np.arange(V) + 400)[:, None] * np.array([1.0, 0, 0]) + 0.5
    _, _, found = vm.nearest_neighbor_search(jnp.asarray(q))
    assert bool(np.all(np.asarray(found)))


def test_ivm_randomized_stream_matches_oracle():
    """Randomized batched stress: 30 inserts x 64 points in a small world
    (tight cell cap, fast LRU cycle) must match the sequential oracle
    voxel-for-voxel and point-for-point. min_sq_dist_in_cell=0 disables
    dedup, so the batched implementation has NO approximation left —
    arrival-order caps, stamping, eviction timing, and slot recycling
    all have to line up exactly with the reference's sequential loop."""
    rng = np.random.default_rng(42)
    vm = IncrementalVoxelMap.empty(
        1.0, capacity=256, dtype=jnp.float64, cell_capacity=3,
        lru_horizon=4, lru_clear_cycle=2, min_sq_dist_in_cell=0.0,
    )
    oracle = OracleIVM(1.0, cell_cap=3, min_sq=0.0, horizon=4, cycle=2)

    for step in range(30):
        # drifting window keeps creating new voxels while old ones expire
        lo = step * 0.4
        pts = rng.uniform(lo, lo + 4.0, size=(64, 3))
        vm = vm.insert(PointCloud.from_points(pts))
        oracle.insert(pts)
        got = _ivm_points_by_voxel(vm)
        want = oracle.points_by_voxel()
        _match_voxel_contents(got, want, atol=1e-9)
        assert int(vm.num_points()) == oracle.size()


def test_gvm_randomized_stream_matches_oracle():
    """Randomized batched stress for the Gaussian map: drifting inserts
    with a fast LRU cycle must reproduce the reference's running
    mean/cov accumulation (gaussian_voxelmap.hpp:32-53: un-finalize,
    add, re-finalize) and eviction timing exactly."""
    rng = np.random.default_rng(7)
    vm = GaussianVoxelMap.empty(
        1.0, capacity=256, dtype=jnp.float64, lru_horizon=4, lru_clear_cycle=2
    )
    counter = 0
    oracle = {}  # coord -> [count, sum_pt(3), sum_cov(3,3), lru]

    for step in range(20):
        lo = step * 0.4
        pts = rng.uniform(lo, lo + 4.0, size=(48, 3))
        a = rng.normal(size=(48, 3, 3))
        covs = a @ np.swapaxes(a, 1, 2) + np.eye(3) * 1e-3

        cloud = PointCloud.from_points(pts).replace(covs=jnp.asarray(covs))
        vm = vm.insert(cloud)

        for p, c in zip(pts, covs):
            coord = tuple(np.floor(p).astype(np.int64))
            e = oracle.setdefault(coord, [0, np.zeros(3), np.zeros((3, 3)), 0])
            e[0] += 1
            e[1] = e[1] + p
            e[2] = e[2] + c
            e[3] = counter  # pre-increment stamp
        counter += 1
        if counter % 2 == 0:
            oracle = {k: v for k, v in oracle.items() if v[3] + 4 >= counter}

        assert int(vm.num_voxels) == len(oracle)
        vk = np.asarray(vm.vox_keys)
        means = np.asarray(vm.means)
        vcovs = np.asarray(vm.covs)
        counts = np.asarray(vm.counts)
        off = 1 << 20
        for slot in np.nonzero(vk != np.iinfo(np.int64).max)[0]:
            k = int(vk[slot])
            coord = (
                (k & ((1 << 21) - 1)) - off,
                ((k >> 21) & ((1 << 21) - 1)) - off,
                ((k >> 42) & ((1 << 21) - 1)) - off,
            )
            assert coord in oracle, coord
            cnt, sp, sc, _ = oracle[coord]
            assert counts[slot] == cnt
            assert np.allclose(means[slot][:3], sp / cnt, atol=1e-9)
            assert np.allclose(vcovs[slot], sc / cnt, atol=1e-9)


def test_gvm_insert_f32_far_from_origin_is_accurate():
    """Regression: the insert's run-sum prefix must not accumulate in
    f32 — at ~100 m map-frame coordinates an f32 whole-scan cumsum puts
    cm-level rounding into every voxel mean (verified: median 1.7 cm,
    max 9.4 cm on an 8k scan before the f64-prefix fix)."""
    rng = np.random.default_rng(3)
    n = 1536  # compact but decisive: the pre-fix cumsum error was cm-level
    pts = rng.uniform(60.0, 160.0, size=(n, 3))
    a = rng.normal(size=(n, 3, 3)).astype(np.float64)
    covs = a @ np.swapaxes(a, 1, 2) * 1e-2 + np.eye(3) * 1e-3

    cloud32 = PointCloud.from_points(pts.astype(np.float32)).replace(
        covs=jnp.asarray(covs, jnp.float32)
    )
    vm32 = GaussianVoxelMap.empty(1.0, capacity=n, dtype=jnp.float32)
    vm32 = vm32.insert(cloud32)

    # f64 oracle of the same insert
    cloud64 = PointCloud.from_points(pts).replace(covs=jnp.asarray(covs))
    vm64 = GaussianVoxelMap.empty(1.0, capacity=n, dtype=jnp.float64)
    vm64 = vm64.insert(cloud64)

    assert int(vm32.num_voxels) == int(vm64.num_voxels)
    # match voxels by key, vectorized (slot order may differ)
    k32 = np.asarray(vm32.vox_keys)
    k64 = np.asarray(vm64.vox_keys)
    live32 = np.where(k32 != np.iinfo(np.int64).max)[0]
    live64 = np.where(k64 != np.iinfo(np.int64).max)[0]
    o32 = live32[np.argsort(k32[live32])]
    o64 = live64[np.argsort(k64[live64])]
    np.testing.assert_array_equal(k32[o32], k64[o64])
    mu32 = np.asarray(vm32.means)[o32, :3]
    mu64 = np.asarray(vm64.means)[o64, :3]
    errs = np.linalg.norm(mu32 - mu64, axis=1)
    np.testing.assert_allclose(
        np.asarray(vm32.covs)[o32], np.asarray(vm64.covs)[o64], atol=1e-3
    )
    # f32 storage alone bounds the error near 1e-5 at 160 m coordinates.
    assert errs.max() < 1e-4, (errs.max(), np.median(errs))
