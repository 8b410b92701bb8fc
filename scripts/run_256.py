import sys
sys.path.insert(0, "/root/repo/scripts")
from bench_suite import run_one, CONFIGS
spec = CONFIGS[-1]
print(run_one(*spec))
