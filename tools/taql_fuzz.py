#!/usr/bin/env python3
"""Cross-engine TAQL fuzz: generate random TAQL predicates, run them through
the engine (graft.TaqlFuzz main applies Taql.toSql + Spark filter) and
through DuckDB, compare row counts.

Usage:
  python3 tools/taql_fuzz.py gen [N] [SEED] > target/taql_fuzz.txt
  sbt "runMain graft.TaqlFuzz target/taql_fuzz.txt" | grep -oE 'TAQLFUZZ.*' > target/taql_spark.txt
  python3 tools/taql_fuzz.py cmp
"""
import random, re, sys

def gen(n=40, seed=42):
    random.seed(seed)
    cols_num = ['l_quantity', 'l_extendedprice', 'l_discount', 'l_tax',
                'l_orderkey', 'l_suppkey', 'l_linenumber']
    cols_str = ['l_returnflag', 'l_linestatus']
    def atom():
        r = random.random()
        if r < 0.45:
            c = random.choice(cols_num)
            op = random.choice(['>', '<', '>=', '<=', '==', '!='])
            v = {'l_quantity': random.randint(1, 50),
                 'l_extendedprice': random.randint(1000, 90000),
                 'l_discount': round(random.uniform(0, 0.1), 2),
                 'l_tax': round(random.uniform(0, 0.08), 2),
                 'l_orderkey': random.randint(1, 60000),
                 'l_suppkey': random.randint(1, 100),
                 'l_linenumber': random.randint(1, 7)}[c]
            return f"{c} {op} {v}"
        elif r < 0.7:
            c = random.choice(cols_str)
            v = random.choice(['A', 'R', 'N', 'O', 'F'])
            return f"{c} {random.choice(['==', '!='])} '{v}'"
        elif r < 0.85:
            c = random.choice(['l_suppkey', 'l_linenumber'])
            vals = sorted(random.sample(range(1, 30), random.randint(2, 5)))
            return f"{c} IN [{','.join(map(str, vals))}]"
        else:
            c = random.choice(cols_num)
            return f"{c}*2 + 1 > {random.randint(10, 100)}"
    def pred(depth=0):
        if depth >= 2 or random.random() < 0.4:
            a = atom()
            return f"!({a})" if random.random() < 0.2 else a
        op = random.choice(['&&', '||'])
        return f"({pred(depth+1)}) {op} ({pred(depth+1)})"
    print('\n'.join(pred() for _ in range(n)))

def to_sql(p):
    p = p.replace('&&', ' AND ').replace('||', ' OR ').replace('==', '=')
    p = re.sub(r'!\(', ' NOT (', p)
    p = re.sub(r'IN \[([^\]]*)\]', r'IN (\1)', p)
    return p

def cmp():
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE VIEW lineitem AS SELECT * FROM "
                "'/root/testdata/sf0.01/lineitem.parquet'")
    preds = open('target/taql_fuzz.txt').read().splitlines()
    spark = {}
    for line in open('target/taql_spark.txt'):
        _, i, c = line.split()
        spark[int(i)] = int(c)
    bad = [(i, p, spark.get(i),
            con.execute(f"SELECT count(*) FROM lineitem WHERE {to_sql(p)}")
               .fetchone()[0])
           for i, p in enumerate(preds)]
    bad = [b for b in bad if b[2] != b[3]]
    print('MISMATCHES:', bad if bad else f'none ({len(preds)} predicates)')
    sys.exit(1 if bad else 0)

if __name__ == '__main__':
    if sys.argv[1:2] == ['gen']:
        gen(*(int(a) for a in sys.argv[2:4]))
    else:
        cmp()
