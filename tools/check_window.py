"""Read-only: print changed-since-record count and names (never mutates)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from wren_engine_spark.queries import fingerprints as fp
from wren_engine_spark.queries.registry import QUERIES, _previously_verified
changed = fp.changed_since_record({n: (f.__module__, f.__name__) for n, f in QUERIES.items()})
green = _previously_verified()
never = [n for n in QUERIES if n not in green]
print(f"changed_since_record: {len(changed)}")
print(f"never_green: {len(never)}")
print(f"window load (changed|never-green): {len(set(changed) | set(never))} / 50")
if changed:
    print("changed:", sorted(changed))
