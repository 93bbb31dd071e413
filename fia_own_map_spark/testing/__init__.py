"""Test fixtures + the pandas oracle implementing reference fixpoint semantics."""
