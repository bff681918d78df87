"""Sinks (SURVEY §2.2): file writers, keyed upsert, operational tables."""
