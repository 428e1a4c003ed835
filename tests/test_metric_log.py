"""MetricLog pipelined journaling: device scalars convert (= device sync)
only once an entry is _FLUSH_DEPTH pairs old; close() drains; resume replays
whatever reached disk and recomputes the in-flight tail."""
import json
import os

import jax.numpy as jnp

from keypoint_bench_tpu.runner import MetricLog


def _lines(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_lagged_flush_and_drain(tmp_path):
    d = str(tmp_path)
    log = MetricLog(d, resume=False)
    n = MetricLog._FLUSH_DEPTH + 3
    for i in range(n):
        log.put(i, {"v": jnp.float32(i) * 2.0})   # device scalar
    # only the entries older than the lag are on disk
    on_disk = _lines(log.path)
    assert len(on_disk) == n - MetricLog._FLUSH_DEPTH
    log.close()
    on_disk = _lines(log.path)
    assert [r["i"] for r in on_disk] == list(range(n))
    assert on_disk[4]["v"] == 8.0


def test_resume_replays_flushed_entries(tmp_path):
    d = str(tmp_path)
    log = MetricLog(d, resume=False)
    for i in range(MetricLog._FLUSH_DEPTH + 2):
        log.put(i, {"v": float(i)})
    # simulate a crash: no close(); the pending tail is lost
    flushed = len(_lines(log.path))
    assert flushed == 2
    log._f.close()

    log2 = MetricLog(d, resume=True)
    assert log2.get(0) == {"i": 0, "v": 0.0}
    assert log2.get(1) == {"i": 1, "v": 1.0}
    assert log2.get(2) is None   # in-flight at crash -> recompute
    log2.close()


def test_no_resume_truncates(tmp_path):
    d = str(tmp_path)
    log = MetricLog(d, resume=False)
    log.put(0, {"v": 1.0})
    log.close()
    log2 = MetricLog(d, resume=False)
    assert log2.get(0) is None
    log2.close()
    assert _lines(os.path.join(d, "progress.jsonl")) == []
