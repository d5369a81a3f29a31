"""Relational/KG operators, each a declarative DataFrame transformation."""
