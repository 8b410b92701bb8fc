import sys
sys.path.insert(0, "/root/repo/scripts")
from bench_suite import run_one, CONFIGS

name = sys.argv[1]
idx = int(sys.argv[2]) if len(sys.argv) > 2 else 0
spec = [c for c in CONFIGS if c[0] == name][idx]
row = run_one(*spec)
