"""Query registry: every implemented operator as a (spark, sf_dir) ->
DataFrame builder plus, where expressible, its ANSI-SQL DuckDB oracle."""
