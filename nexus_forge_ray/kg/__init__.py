"""Knowledge-graph construction operators: mention detection, triple
extraction, canonicalization (MinHash-LSH blocking + connected components)."""
