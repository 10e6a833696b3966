"""Training-data-pipeline operators beyond the reference's linkage surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), approximate similarity search, text analysis, relational
primitives, and multimodal plumbing stubs. All Ray-Data-first."""
