"""CLI entry points (SURVEY.md L5: C1), flag-compatible with the reference."""
