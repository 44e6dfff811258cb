"""OTLP -> flat-table transforms: the semantic heart of the engine.

The reference converts OTLP pdata object trees to Arrow RecordBatches
with hand-rolled row loops (internal/arrow/{traces,logs,metrics}.go).
Here the same projections are declarative Catalyst plans over OTLP/JSON
input (the public OpenTelemetry file-exporter format): explode the
3-level nesting, then one `select` per output table.
"""

from .traces import flatten_traces
from .logs import flatten_logs
from .metrics import flatten_metrics

__all__ = ["flatten_traces", "flatten_logs", "flatten_metrics"]
