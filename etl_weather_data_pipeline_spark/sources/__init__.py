"""Schema-enforced sources (SURVEY §2.1)."""
