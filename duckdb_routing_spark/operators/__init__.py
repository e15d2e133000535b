"""Large-scale training-data pipeline operators: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard), similarity search (brute-force cosine
top-k, LSH-bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting), and multimodal column plumbing.

All hot paths are pure Catalyst expressions (split/transform/aggregate/
higher-order functions) — no Python UDFs — so they stay inside whole-stage
codegen and scale to 100 TB document tables; only the multimodal decode stubs
use mapInPandas (Arrow-batched), as real media decoding would.
"""
