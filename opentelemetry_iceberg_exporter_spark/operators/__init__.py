"""Scale-out data-pipeline operators beyond the reference surface
(BASELINE.json north star): deduplication, similarity search, text
analysis, multimodal column plumbing, as-of/range joins.

Each operator is a plain DataFrame->DataFrame function designed for
100 TB execution (no driver-side collects, shuffle-conscious plans),
plus registered oracle-checked queries over the driver's testdata.
"""
