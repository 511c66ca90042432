"""Large-scale training-data operators beyond the reference's inventory:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), ANN similarity search, text analysis (language-ID, quality,
token counts, fingerprints), and multimodal column plumbing."""
