"""nkbx.core.profiling — perfetto-trace aggregation (no device needed)."""

import gzip
import json

import pytest

from nkbx.core.profiling import (
    aggregate_perfetto,
    categorize_kernel,
    format_breakdown,
)


def _write_trace(path, events):
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


@pytest.fixture
def trace_dir(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    meta = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "tid": 10, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 2, "tid": 11, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 2, "tid": 12, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
    ]
    kernels = [
        # host event: must be ignored
        {"ph": "X", "pid": 1, "tid": 1, "name": "python", "dur": 99000},
        # enclosing spans: must be ignored (would double-count)
        {"ph": "X", "pid": 2, "tid": 11, "name": "1", "dur": 50000},
        {"ph": "X", "pid": 2, "tid": 12, "name": "jit_step", "dur": 50000},
        # kernels (dur in us)
        {"ph": "X", "pid": 2, "tid": 10, "name": "fusion.1", "dur": 3000},
        {"ph": "X", "pid": 2, "tid": 10, "name": "fusion.1", "dur": 1000},
        {"ph": "X", "pid": 2, "tid": 10, "name": "copy.2", "dur": 2000},
        {"ph": "X", "pid": 2, "tid": 10, "name": "attn.3", "dur": 5000},
        {"ph": "X", "pid": 2, "tid": 10, "name": "convolution.4", "dur": 500},
    ]
    _write_trace(d / "host.trace.json.gz", meta + kernels)
    return tmp_path


def test_aggregate_sums_and_filters(trace_dir):
    agg = aggregate_perfetto(str(trace_dir))
    assert agg["total_ms"] == pytest.approx(11.5)  # 4+2+5+0.5, spans excluded
    assert agg["by_name"]["fusion.1"] == pytest.approx(4.0)
    assert "1" not in agg["by_name"] and "jit_step" not in agg["by_name"]
    assert agg["by_category"]["generic fusions"] == pytest.approx(4.0)
    assert agg["by_category"]["copies/transposes"] == pytest.approx(2.0)
    assert agg["by_category"]["convolutions"] == pytest.approx(0.5)
    # names sorted by descending time
    assert list(agg["by_name"])[0] == "attn.3"


def test_extra_category_hook(trace_dir):
    agg = aggregate_perfetto(
        str(trace_dir),
        extra_category=lambda n: "attention" if n.startswith("attn") else None)
    assert agg["by_category"]["attention"] == pytest.approx(5.0)
    assert agg["by_category"]["generic fusions"] == pytest.approx(4.0)


def test_format_breakdown_renders(trace_dir):
    text = format_breakdown(aggregate_perfetto(str(trace_dir)), top=3)
    assert "total device time: 11.50 ms" in text
    assert "attn.3" in text


def test_missing_trace_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="trace.json.gz"):
        aggregate_perfetto(str(tmp_path))


def test_categorizer_buckets():
    assert categorize_kernel("convert_reduce_fusion.9") == \
        "convert_reduce fusions (bwd+stats)"
    assert categorize_kernel("multiply_add_fusion.2") == \
        "multiply_add fusions (dW-style)"
    assert categorize_kernel("select_and_scatter") == "misc"
    assert categorize_kernel("dynamic-update-slice.1") == "slice/concat/pad"
