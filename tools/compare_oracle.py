import duckdb, json, glob, os, sys, math
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/root/repo/target/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return 'nan'
        return round(v, 9)
    import numpy as np
    if isinstance(v, (list, tuple)) or type(v).__name__ == 'ndarray': return tuple(norm(x) for x in v)
    return v
fails = []
seen = set()
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    seen.add(name)
    files = glob.glob(d + '/*.parquet')
    if not files:
        err = os.path.join(d, '_ERROR.txt')
        if os.path.exists(err):
            msg = open(err).read().strip().splitlines()[:1]
            print(f'{name}: QUERY ERROR: {msg[0] if msg else ""}')
        else:
            print(f'{name}: NO OUTPUT')
        fails.append(name); continue
    mine = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        print(f'{name}: rows-only ({len(mine)} rows)'); 
        if len(mine) == 0: fails.append(name)
        continue
    try:
        theirs = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f'{name}: ORACLE SQL ERROR: {e}'); fails.append(name); continue
    mc, tc = sorted(mine.columns), sorted(theirs.columns)
    if mc != tc:
        print(f'{name}: COLUMN MISMATCH mine={mc} oracle={tc}'); fails.append(name); continue
    if len(mine) != len(theirs):
        print(f'{name}: ROWCOUNT {len(mine)} vs {len(theirs)}'); fails.append(name); continue
    a = [tuple(norm(v) for v in row) for row in mine[mc].itertuples(index=False)]
    b = [tuple(norm(v) for v in row) for row in theirs[tc].itertuples(index=False)]
    a.sort(); b.sort()
    if a != b:
        bad = [(x,y) for x,y in zip(a,b) if x != y][:3]
        print(f'{name}: VALUE MISMATCH, first diffs: {bad}'); fails.append(name); continue
    print(f'{name}: OK ({len(mine)} rows)')
# roster reconciliation: a query whose output dir is missing ENTIRELY
# (Verify hard-killed before its per-query catch could write the error
# marker) must still surface as a failure, not as silent absence
for name in sorted(set(oracle) - seen):
    print(f'{name}: MISSING OUTPUT DIR'); fails.append(name)
print('\nFAILURES:', fails if fails else 'none')
