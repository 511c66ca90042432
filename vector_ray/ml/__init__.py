"""Large-scale training-data operators beyond the reference's inventory:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine, SemDeDup semantic), ANN similarity search, text analysis
(language-ID, quality, LM perplexity, token counts, fingerprints),
corpus assembly (packing, chunking, decontamination, mixture sampling),
and multimodal column plumbing."""
