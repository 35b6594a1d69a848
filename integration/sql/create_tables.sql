-- Seed for the S8 incremental-source path: route_suppliers is the
-- incrementing-id dimension table the reference's Connect JDBC source
-- polls (reference config/route-suppliers.json: mode=incrementing on
-- column id; reference sql/create_tables.sql: SERIAL id + supplier
-- name rows). Result tables are NOT pre-created: the upsert sink
-- auto-creates/evolves them (S7, the Connect auto.create contract).
CREATE TABLE IF NOT EXISTS route_suppliers (
    id SERIAL PRIMARY KEY,
    name VARCHAR(255) NOT NULL
);

INSERT INTO route_suppliers (name)
SELECT 'Supplier ' || s
FROM generate_series(1, 10) AS s
WHERE NOT EXISTS (SELECT 1 FROM route_suppliers);
