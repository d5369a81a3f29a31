"""Corpus synthesis and table IO."""
