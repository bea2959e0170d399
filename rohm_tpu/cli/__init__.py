"""CLI drivers (L6) with the reference's script names and YAML/flag surface."""
