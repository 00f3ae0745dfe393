"""Plan inspection / audit helpers (Catalyst-visibility checks)."""
