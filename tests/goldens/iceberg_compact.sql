CALL lake.system.rewrite_data_files(table => 'lake.db.t')
