// Cube KV client (Go) — see README.md for the wire protocol.
// Usage:
//   c, _ := Dial("127.0.0.1:9527")
//   vals, dim, _ := c.Seek([]int64{1, 2, 3})
package cube

import (
	"encoding/binary"
	"fmt"
	"io"
	"math"
	"net"
)

const (
	reqMagic  = 0x43554251
	respMagic = 0x43554252
	anyShard  = 0xFFFFFFFF
)

type Client struct {
	conn net.Conn
}

func Dial(addr string) (*Client, error) {
	conn, err := net.Dial("tcp", addr)
	if err != nil {
		return nil, err
	}
	return &Client{conn: conn}, nil
}

func (c *Client) Close() error { return c.conn.Close() }

// Seek returns values[n*dim] (zeros on miss) and dim.
func (c *Client) Seek(keys []int64) ([]float32, int, error) {
	return c.SeekShard(anyShard, keys)
}

func (c *Client) SeekShard(shard uint32, keys []int64) ([]float32, int, error) {
	req := make([]byte, 12+8*len(keys))
	binary.LittleEndian.PutUint32(req[0:], reqMagic)
	binary.LittleEndian.PutUint32(req[4:], shard)
	binary.LittleEndian.PutUint32(req[8:], uint32(len(keys)))
	for i, k := range keys {
		binary.LittleEndian.PutUint64(req[12+8*i:], uint64(k))
	}
	if _, err := c.conn.Write(req); err != nil {
		return nil, 0, err
	}
	header := make([]byte, 20)
	if _, err := io.ReadFull(c.conn, header); err != nil {
		return nil, 0, err
	}
	if binary.LittleEndian.Uint32(header[0:]) != respMagic {
		return nil, 0, fmt.Errorf("bad response magic")
	}
	if status := binary.LittleEndian.Uint32(header[4:]); status != 0 {
		return nil, 0, fmt.Errorf("cube server status %d", status)
	}
	dim := int(binary.LittleEndian.Uint32(header[8:]))
	n := int(binary.LittleEndian.Uint32(header[12:]))
	raw := make([]byte, n*dim*4)
	if _, err := io.ReadFull(c.conn, raw); err != nil {
		return nil, 0, err
	}
	vals := make([]float32, n*dim)
	for i := range vals {
		vals[i] = math.Float32frombits(
			binary.LittleEndian.Uint32(raw[4*i:]))
	}
	return vals, dim, nil
}
