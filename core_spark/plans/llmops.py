"""LLM-data-pipeline operator queries (dedup families, similarity
search, text analysis) over `documents` / `embeddings`.

Populated in the P3 build phase — see core_spark/operators/dedup.py,
similarity.py and functions/text.py.
"""
