// Cube KV client (Java) — see README.md for the wire protocol.
//   CubeClient c = new CubeClient("127.0.0.1", 9527);
//   float[] vals = c.seek(new long[]{1, 2, 3});   // n*dim, zeros on miss
import java.io.DataInputStream;
import java.io.IOException;
import java.io.OutputStream;
import java.net.Socket;
import java.nio.ByteBuffer;
import java.nio.ByteOrder;

public class CubeClient implements AutoCloseable {
    private static final int REQ_MAGIC = 0x43554251;
    private static final int RESP_MAGIC = 0x43554252;
    public static final int ANY_SHARD = 0xFFFFFFFF;

    private final Socket socket;
    private int dim = -1;

    public CubeClient(String host, int port) throws IOException {
        socket = new Socket(host, port);
        socket.setTcpNoDelay(true);
    }

    public int dim() { return dim; }

    public float[] seek(long[] keys) throws IOException {
        return seekShard(ANY_SHARD, keys);
    }

    public float[] seekShard(int shard, long[] keys) throws IOException {
        ByteBuffer req = ByteBuffer.allocate(12 + 8 * keys.length)
                .order(ByteOrder.LITTLE_ENDIAN);
        req.putInt(REQ_MAGIC).putInt(shard).putInt(keys.length);
        for (long k : keys) req.putLong(k);
        OutputStream out = socket.getOutputStream();
        out.write(req.array());
        out.flush();

        DataInputStream in = new DataInputStream(socket.getInputStream());
        byte[] header = new byte[20];
        in.readFully(header);
        ByteBuffer h = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN);
        if (h.getInt() != RESP_MAGIC)
            throw new IOException("bad response magic");
        int status = h.getInt();
        if (status != 0) throw new IOException("cube server status " + status);
        dim = h.getInt();
        int n = h.getInt();
        h.getInt(); // hits
        byte[] raw = new byte[n * dim * 4];
        in.readFully(raw);
        ByteBuffer vb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN);
        float[] vals = new float[n * dim];
        for (int i = 0; i < vals.length; i++) vals[i] = vb.getFloat();
        return vals;
    }

    @Override
    public void close() throws IOException { socket.close(); }
}
