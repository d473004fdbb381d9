"""Momentum (a,b) sweep tests: per-lane traced momentum equals per-pair
static momentum, and the sweep reproduces the papers' qualitative headline
(larger `a` cuts iterations vs classic FISTA)."""

import numpy as np
import pytest

from zfista_tpu.bench.momentum_sweep import AB_GRID, momentum_sweep, write_ab_csv
from zfista_tpu.models.zoo import JOS1
from zfista_tpu.parallel.batch import minimize_proximal_gradient_batch


def test_batched_ab_matches_static_ab():
    prob = JOS1(n_features=5)
    rng = np.random.default_rng(0)
    x0s = rng.uniform(-2, 4, size=(3, 5))
    pairs = [(0.0, 0.25), (0.75, 0.25), (0.5, 0.0625)]
    # one lane per (x0, pair) combination
    x0_lanes = np.tile(x0s, (len(pairs), 1))
    ab_lanes = np.repeat(np.asarray(pairs), len(x0s), axis=0)
    res = minimize_proximal_gradient_batch(
        prob.f,
        prob.g,
        prob.jac_f,
        prob.prox_wsum_g,
        x0_lanes,
        batch_nesterov_ratio=ab_lanes,
        nesterov=True,
    )
    lanes = res.to_list()
    for i, (a, b) in enumerate(pairs):
        static = minimize_proximal_gradient_batch(
            prob.f,
            prob.g,
            prob.jac_f,
            prob.prox_wsum_g,
            x0s,
            nesterov=True,
            nesterov_ratio=(a, b),
        ).to_list()
        for j in range(len(x0s)):
            lane = lanes[i * len(x0s) + j]
            assert lane.nit == static[j].nit
            np.testing.assert_allclose(lane.x, static[j].x, atol=1e-12)


def test_sweep_reproduces_headline(tmp_path):
    # Papers' qualitative claim (BASELINE.md): (a,b)=(3/4,1/4) needs fewer
    # iterations than classic FISTA (0,1/4) on JOS1 (97->47 in the
    # reference data; we assert the direction, not the exact counts).
    prob = JOS1(n_features=50)
    rows, res = momentum_sweep(prob, -2, 4, n_starts=20, max_iter=5000)
    assert len(rows) == len(AB_GRID)
    by_ab = {(r["a"], r["b"]): r for r in rows}
    classic = by_ab[("0", "1/4")]
    fast = by_ab[("3/4", "1/4")]
    assert fast["nit"] < classic["nit"]
    assert all(r["error_rate"] == 0.0 for r in rows)

    out = tmp_path / "JOS1_ab.csv"
    write_ab_csv(rows, out)
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 15
    assert lines[0].startswith("0 ,0,")


def test_lane_chunked_sweep_consistent():
    # Chunked and unchunked sweeps agree; ragged tails are padded and the
    # merged result is internally consistent (regression: to_list worked
    # only on the first chunk).
    prob = JOS1(n_features=5)
    pairs = [(0.0, 0.25), (0.75, 0.25)]
    rows_full, res_full = momentum_sweep(
        prob, -2, 4, n_starts=7, ab_grid=pairs, max_iter=3000
    )
    rows_chunk, res_chunk = momentum_sweep(
        prob, -2, 4, n_starts=7, ab_grid=pairs, max_iter=3000, lane_chunk=5
    )
    for rf, rc in zip(rows_full, rows_chunk):
        assert rf["nit"] == rc["nit"]
    assert len(res_chunk.x) == len(res_full.x) == 14
    np.testing.assert_array_equal(res_chunk.x, res_full.x)
    lst = res_chunk.to_list()
    assert len(lst) == 14
    with pytest.raises(ValueError):
        momentum_sweep(prob, -2, 4, n_starts=4, ab_grid=pairs, lane_chunk=0)


def test_lane_chunked_history_and_state_consistency():
    # Regression: padded-state trim, history time-axis padding, summed time.
    prob = JOS1(n_features=5)
    pairs = [(0.0, 0.25), (0.75, 0.25), (0.5, 0.0625)]
    rows, res = momentum_sweep(
        prob, -2, 4, n_starts=5, ab_grid=pairs, max_iter=3000,
        lane_chunk=4, history=True, history_chunk=16,
    )
    B = len(pairs) * 5
    assert len(res.x) == B
    assert len(res.state.x) == B  # padded lanes trimmed from the state too
    assert res.allfuns.shape[0] == B  # history merged across ragged chunks
    lst = res.to_list()
    assert len(lst) == B and all(len(r.allfuns) >= 1 for r in lst)


def test_all_failed_pair_rows_are_guarded(tmp_path):
    """A pair whose starts all fail yields time=nit=None / error_rate=1 and
    empty CSV fields instead of NaNs (ADVICE r1)."""
    from zfista_tpu.models.lasso import Lasso

    A = np.array([[1.0], [0.0]])
    b = np.array([1.0, 0.0])
    prob = Lasso(A, b, l1_ratio=0.1)
    # lr far above 2/L with aggressive backtracking disabled via
    # max_backtrack_iter=1 makes every start fail the line search.
    rows, _ = momentum_sweep(
        prob,
        -1.0,
        1.0,
        n_starts=2,
        ab_grid=[(0.0, 0.25)],
        lr=1e6,
        max_backtrack_iter=1,
        max_iter=50,
    )
    (row,) = rows
    assert row["error_rate"] == 1.0
    assert row["time"] is None and row["nit"] is None
    out = tmp_path / "ab.csv"
    write_ab_csv(rows, out)
    line = out.read_text().strip()
    assert line.endswith(",,"), line


def test_measured_times_and_x0_override():
    """measure_times=True re-times each pair (positive measured seconds,
    distinct from the modeled attribution path), and x0s= overrides the
    sampled starts."""
    import numpy as np

    from zfista_tpu.bench.momentum_sweep import momentum_sweep
    from zfista_tpu.models.zoo import JOS1

    prob = JOS1(n_features=5)
    x0s = np.linspace(-1.0, 2.0, 15).reshape(3, 5)
    grid = [(0, 0.25), (0.5, 0.25)]
    rows, res = momentum_sweep(
        prob, -2, 4, n_starts=3, ab_grid=grid, x0s=x0s, measure_times=True,
        max_iter=2000,
    )
    assert [r["error_rate"] for r in rows] == [0.0, 0.0]
    for r in rows:
        assert r["time"] is not None and r["time"] > 0
    # x0s really used: the shared sweep's x0 field is the tiled override
    np.testing.assert_allclose(np.asarray(res.x0)[:3], x0s)
    # modeled fallback still works and differs in provenance
    rows_m, _ = momentum_sweep(
        prob, -2, 4, n_starts=3, ab_grid=grid, x0s=x0s, measure_times=False,
        max_iter=2000,
    )
    assert [r["nit"] for r in rows_m] == [r["nit"] for r in rows]


def test_write_ab_csv_three_significant_digits(tmp_path):
    """Sub-ms times keep >= 3 significant digits at every magnitude —
    values in [0.5, 1.0)x10^-k previously collapsed to 2 (review
    finding: rounding 7.3e-5 at 4 decimals is already nonzero)."""
    rows = [
        dict(a="0 ", b="0", time=7.3e-5, nit=30.0),
        dict(a="0 ", b="1/8", time=5.0e-5, nit=31.0),
        dict(a="0 ", b="1/4", time=0.0123456, nit=32.0),
        dict(a="1/6 ", b="1/144", time=1.08, nit=33.0),
    ]
    out = tmp_path / "t.csv"
    write_ab_csv(rows, out)
    lines = out.read_text().splitlines()
    assert lines[0].split(",")[2] == "0.0000730"
    assert lines[1].split(",")[2] == "0.0000500"
    assert lines[2].split(",")[2] == "0.0123"
    assert lines[3].split(",")[2] == "1.080"
