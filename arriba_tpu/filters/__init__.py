"""The filter/recovery cascade.

Read-level filters (operate on chimeric alignments) live in read_level.py;
event-level filters (operate on the fusion table) in event_level.py and
sibling modules. Each filter mirrors one reference source file and returns
the number of remaining (unfiltered) items, exactly like the reference's
per-stage `remaining=` counters.
"""
