"""map_batches stages: codecs, tokenize, dedup, text analysis, similarity."""
