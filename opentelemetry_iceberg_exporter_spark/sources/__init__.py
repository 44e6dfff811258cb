"""Sources: testdata star-schema loader, OTLP-JSON batch/stream sources,
and storage-listing source (reference S1-S6)."""
