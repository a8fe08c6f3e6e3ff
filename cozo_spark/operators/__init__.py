"""Scale-oriented operators beyond the reference's inventory: dedup,
similarity search, text analysis, multimodal plumbing, validity reads."""
