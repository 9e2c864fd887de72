"""Custom operators: interval overlap join, nearest join, count-overlaps."""
