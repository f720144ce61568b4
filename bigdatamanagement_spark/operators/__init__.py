"""Reusable engine operators (document nesting, recommendations,
time-series downsampling, dedup, similarity search, text analysis)."""
