"""Library operators — each a DataFrame -> DataFrame function."""
