"""Beyond-reference LLM-data-pipeline operators (BASELINE.json north
star): deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search, text analysis, and
multimodal column plumbing — all designed for 100 TB scale:
declarative DataFrame plans (no driver-side loops), posting-list /
LSH-bucket joins instead of quadratic blowups, Pandas UDFs only
where built-ins can't express the semantics (multimodal decode).
"""
