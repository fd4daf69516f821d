"""Vectorized scalar-function families and large-scale training-data ops:
text analysis, dedup (exact / MinHash-LSH / SimHash / n-gram / embedding),
similarity search, multimodal plumbing. SURVEY.md §2.8 + task extensions."""
