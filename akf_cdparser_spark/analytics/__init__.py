"""Corpus analytics: dedup, similarity search, text quality, LSE histograms,
multimodal plumbing — the large-scale training-data operations layered on
the same engine (SURVEY.md §2.6 plus the pipeline ops the 100 TB tier
needs)."""
