"""Scalar function layer: validation rules, drop-reason cascade, text
analytics, time utilities. All built-in-expression compositions."""
