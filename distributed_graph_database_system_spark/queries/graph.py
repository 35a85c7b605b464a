"""Graph queries — populated in M2."""
