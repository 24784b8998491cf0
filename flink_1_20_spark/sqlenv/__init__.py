"""Statement-family modules of the executeSql surface (r10 split
of sql_ddl.py): text helpers + one mixin per family, composed by
sql_ddl.TableEnvironment."""
