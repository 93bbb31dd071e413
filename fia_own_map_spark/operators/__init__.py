"""Operators: the three ER stages plus dedup/ANN/text/classify capability ops."""
