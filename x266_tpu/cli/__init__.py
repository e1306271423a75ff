"""T5 command-line front-end (C19)."""
