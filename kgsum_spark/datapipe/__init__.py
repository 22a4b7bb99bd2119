"""Training-data pipeline operators for large corpora: deduplication,
similarity search, text analysis, multimodal column plumbing.

No reference analog (kgsum profiles KGs, not corpora) — these are the
operations a 100 TB training-data pipeline needs, built on the same
Spark-first discipline: built-in expressions where possible, Arrow-batched
pandas UDFs where not, shuffle only on deliberately chosen keys.
"""
