"""Operator modules. Each registers its queries with the central registry."""
