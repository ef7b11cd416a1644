"""reset_stats: warmup latencies must not poison measured percentiles
(bench_serve.py resets after its compile-time warmup pass)."""

import numpy as np

from sls_tpu.serve.engine import BatchingEngine
from tests.test_serve import CUT, stub_score_fn


def test_reset_stats_clears_counters_and_percentiles():
    with BatchingEngine(stub_score_fn, 4, cut=CUT, max_wait_ms=1) as eng:
        for _ in range(3):
            eng.score(np.ones(CUT, np.float32))
        assert eng.stats().requests == 3
        eng.reset_stats()
        st = eng.stats()
        assert st.requests == 0 and st.batches == 0
        assert st.p50_ms == st.p99_ms == 0.0 and st.mean_fill == 0.0
        # engine keeps serving after a reset
        s = eng.score(np.ones(CUT, np.float32))
        assert 0.0 < s < 1.0
        assert eng.stats().requests == 1
