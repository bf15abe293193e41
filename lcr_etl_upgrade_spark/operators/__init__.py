"""Composable DataFrame -> DataFrame operator library.

conform     — P1-P4 schema conformance + audit enrichment + validation
cleanse     — C1-C10 / F3-F5 type-coercion and scrubbing passes
parsers     — U1/U2 Arrow-vectorized fuzzy timestamp/date parsers
incremental — F1/F2/C10 watermark-based CDC-lite loads
dedup       — L1/L2 exact + MinHash-LSH / SimHash near-duplicate detection
similarity  — L3 embedding cosine top-k (brute force + LSH-bucketed)
text        — L4 language-ID, quality scoring, token counts, fingerprints
multimodal  — L5 binary-column plumbing (decode stubbed; see module doc)
"""
