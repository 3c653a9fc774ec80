"""Measured-negative research artifacts kept for their recorded evidence.

Nothing here is on a production path; see each module's docstring for the
measurement that retired it and the conditions under which it would be
worth revisiting.
"""
