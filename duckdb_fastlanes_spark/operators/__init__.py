"""Relational operator inventory (SURVEY.md §2.B / §2.C) as named queries."""
