"""Relational and dataflow operators beyond plain expressions."""
