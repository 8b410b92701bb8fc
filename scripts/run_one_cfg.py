import sys
sys.path.insert(0, "/root/repo/scripts")
from bench_suite import run_one, CONFIGS
import json
name = sys.argv[1]
spec = [c for c in CONFIGS if c[0] == name][0]
row = run_one(*spec)
