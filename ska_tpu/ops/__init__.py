"""Device-side primitives: packed-key ops, window extraction, sort/segment engine."""
