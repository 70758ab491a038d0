"""Operator library — each SURVEY.md §2 operator as a composable
DataFrame→DataFrame function, plus the large-scale extension operators.
"""
