"""Operator catalog. Every operator is a pure DataFrame -> DataFrame
function keyed to SURVEY.md §2 operator IDs in its docstring."""
