"""LLM-data-pipeline operators (BASELINE.json north star): dedup,
similarity search, text analysis, multimodal — over documents/embeddings.
"""

from __future__ import annotations
