"""Concurrent-plan safety for the ``datactx.unreserved`` tuning.

``unreserved`` disables Ray Data's per-op resource reservation — the
mechanism that exists so UNRELATED concurrent datasets can't starve
each other over object-store memory. The library's documented stance is
single-plan-at-a-time, but a user CAN run two pipelines concurrently
(e.g. a dashboard thread beside a batch job); this gate proves that
realistic shuffle-bearing plans executed in parallel threads (a) both
complete (no deadlock/livelock) and (b) return exactly their
single-plan results, and that the global flag is restored afterwards.
"""

from concurrent.futures import ThreadPoolExecutor

import pandas as pd

SF = "/root/testdata/sf0.01"


def _norm(t):
    df = t.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_two_unreserved_plans_run_concurrently(ray_session):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    # sequential references (each its own plan, shuffle included)
    seq_a = _norm(dp._to_table(dp.exact_dedup_keepers(SF)))
    seq_b = _norm(dp._to_table(dp.mode_event_type(SF)))

    def run_a():
        return _norm(dp._to_table(dp.exact_dedup_keepers(SF)))

    def run_b():
        return _norm(dp._to_table(dp.mode_event_type(SF)))

    with ThreadPoolExecutor(max_workers=2) as ex:
        fa = ex.submit(run_a)
        fb = ex.submit(run_b)
        got_a = fa.result(timeout=300)
        got_b = fb.result(timeout=300)

    pd.testing.assert_frame_equal(got_a, seq_a, check_dtype=False)
    pd.testing.assert_frame_equal(got_b, seq_b, check_dtype=False)

    # the decorator restored the global flag (last writer wins is fine —
    # both restore to the default True)
    from ray.data import DataContext

    assert DataContext.get_current().op_resource_reservation_enabled
