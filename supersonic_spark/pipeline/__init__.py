"""Large-scale training-data pipeline operators (beyond-reference mandate,
BASELINE.json north star).

- ``dedup``      — exact, MinHash+LSH (skew-saltable banding), SimHash,
                   n-gram Jaccard (df-capped), fuzzy/edit-distance,
                   embedding near-dup, connected components (min-label +
                   large-star/small-star), benchmark decontamination
- ``similarity`` — brute-force cosine top-k; LSH / IVF / PQ / IVF-PQ
                   ANN with deterministic bounded-sample training; exact
                   rerank; k-means; pooling/quantization
- ``textstats``  — language-ID, quality scoring, token counting,
                   document fingerprinting, TF-IDF, repetition, PII,
                   LM fluency, chunking
- ``sampling``   — hash-deterministic splits/samples/shuffle and greedy
                   sequence packing (reproducible across runs/partitionings)
- ``multimodal`` — opaque binary media columns with typed metadata;
                   REAL decode/resize/audio kernels over Arrow batches
- ``codecs``     — the pure-stdlib PNG/BMP/PPM/WAV codecs those kernels
                   parse bytes with (zlib inflate + unfilter, RIFF PCM)

Everything is built from JVM-side builtins (higher-order array functions,
xxhash64) — no Python in the hot path except the multimodal mapInPandas,
which is Arrow-batched by design.
"""
