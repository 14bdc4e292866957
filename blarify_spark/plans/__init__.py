"""Pipeline stages: extract -> link -> canonicalize -> materialize."""
