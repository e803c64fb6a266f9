"""Engine operators: dimension maintenance, quarantine split, dedup,
similarity search, text analysis, multimodal plumbing."""
