"""Structured Streaming operators over the `events` stream (extension
surface; the reference is batch-only — SURVEY.md §2-I).
"""
