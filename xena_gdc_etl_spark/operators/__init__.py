"""Distributed operators re-expressing the reference's pandas transforms."""
