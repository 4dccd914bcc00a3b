"""Shared host utilities."""
