"""Declarative query plans: analytic views and benchmark queries."""
