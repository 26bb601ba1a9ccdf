"""Relational + vector + pipeline operators, all expressed as DataFrame
transformations so Catalyst owns the physical plan."""
