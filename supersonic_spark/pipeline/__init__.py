"""Large-scale training-data pipeline operators (beyond-reference mandate,
BASELINE.json north star).

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity`` — brute-force cosine top-k; LSH-bucketed ANN
- ``textstats``  — language-ID, quality scoring, token counting,
                   document fingerprinting
- ``sampling``   — hash-deterministic splits/samples/shuffle and greedy
                   sequence packing (reproducible across runs/partitionings)
- ``multimodal`` — opaque binary media columns with typed metadata;
                   decode/feature steps are Arrow-batched pandas UDFs with
                   the heavy codecs stubbed (not present in this container)

Everything is built from JVM-side builtins (higher-order array functions,
xxhash64) — no Python in the hot path except the multimodal mapInPandas,
which is Arrow-batched by design.
"""
