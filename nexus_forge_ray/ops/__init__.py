"""Scale-oriented data ops: dedup, similarity search, text analysis, multimodal stubs."""
