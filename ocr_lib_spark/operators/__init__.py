"""Engine operators: tokenize, segment, classify, extract, dedup, ANN."""
