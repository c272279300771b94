"""Reference-import compatibility package (see module shims within)."""
