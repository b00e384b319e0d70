"""Sources: layer catalog (data environment), the images corpus table,
and the deterministic fixture generator."""
