"""Repo-local developer tools (parity harness, plan dumps)."""
