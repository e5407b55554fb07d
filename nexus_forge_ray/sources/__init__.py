"""Input sources: synthetic Common-Crawl-style page table + readers."""
