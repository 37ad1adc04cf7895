"""KB compile job: static scores, namelist, broadcast automaton (SURVEY M1)."""
