#!/usr/bin/env python3
"""P4 expression-language fuzz: random arithmetic expressions evaluated by
the engine (graft.ExprFuzz writes raw doubles to parquet) and by DuckDB,
compared BIT-EXACT.

Usage:
  python3 tools/expr_fuzz.py gen [N] [SEED] > target/expr_fuzz.txt
  sbt "runMain graft.ExprFuzz target/expr_fuzz.txt target/expr_fuzz_out"
  python3 tools/expr_fuzz.py cmp
"""
import random, re, struct, sys

def gen(n=30, seed=7):
    random.seed(seed)
    cols = ['l_quantity', 'l_extendedprice', 'l_discount', 'l_tax',
            'l_linenumber', 'l_suppkey']
    def atom():
        if random.random() < 0.6: return random.choice(cols)
        return str(random.choice([2, 3, 7, 10, 0.5, 1.25]))
    def ex(depth=0):
        if depth >= 3 or random.random() < 0.35:
            a = atom()
            return f"-{a}" if random.random() < 0.15 else a
        op = random.choice(['+', '-', '*', '//'])
        l, r = ex(depth + 1), ex(depth + 1)
        if op == '//':
            r = random.choice(['7', '3', '10', 'l_quantity + 1'])
        return f"({l}) {op} ({r})"
    print('\n'.join(ex() for _ in range(n)))

def to_sql(e):
    # rewrite every `(A) // (B)` to floor((A) / (B)) with real balanced-
    # paren matching — the old one-nesting-level regex silently left
    # deeply nested `//` for DuckDB, whose native `//` on DOUBLE is plain
    # division, not the numpy floor division the expression language
    # defines (found by the seed-777 fuzz run)
    while '//' in e:
        i = e.index('//')
        j = i
        while e[j - 1] == ' ':
            j -= 1
        assert e[j - 1] == ')', e
        depth, k = 0, j - 1
        while True:
            if e[k] == ')':
                depth += 1
            elif e[k] == '(':
                depth -= 1
            if depth == 0:
                break
            k -= 1
        left = e[k:j]
        p = i + 2
        while e[p] == ' ':
            p += 1
        assert e[p] == '(', e
        depth, q = 0, p
        while True:
            if e[q] == '(':
                depth += 1
            elif e[q] == ')':
                depth -= 1
            if depth == 0:
                break
            q += 1
        right = e[p:q + 1]
        e = e[:k] + f"floor({left} / {right})" + e[q + 1:]
    return e

def cmp():
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE VIEW lineitem AS SELECT * FROM "
                "'/root/testdata/sf0.01/lineitem.parquet'")
    exprs = open('target/expr_fuzz.txt').read().splitlines()
    sel = ', '.join(f"CAST(({to_sql(e)}) AS DOUBLE) AS e{i}"
                    for i, e in enumerate(exprs))
    key = ("l_orderkey, l_linenumber, l_partkey, l_suppkey, "
           "l_quantity, l_extendedprice")
    duck = con.execute(f"WITH s AS (SELECT * FROM lineitem ORDER BY {key} "
                       f"LIMIT 200) SELECT {sel} FROM s ORDER BY {key}").fetchall()
    mine = con.execute(
        f"SELECT {', '.join(f'e{i}' for i in range(len(exprs)))} "
        f"FROM 'target/expr_fuzz_out/*.parquet' ORDER BY {key}").fetchall()
    bits = lambda x: None if x is None else struct.pack('<d', x)
    bad = {(i, exprs[i]) for ra, rb in zip(mine, duck)
           for i, (a, b) in enumerate(zip(ra, rb)) if bits(a) != bits(b)}
    print('MISMATCHES:', sorted(bad) if bad else
          f'none ({len(exprs)} expressions, bit-exact)')
    sys.exit(1 if bad else 0)

if __name__ == '__main__':
    if sys.argv[1:2] == ['gen']:
        gen(*(int(a) for a in sys.argv[2:4]))
    else:
        cmp()
