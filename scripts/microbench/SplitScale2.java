import java.util.regex.Pattern;

public class SplitScale2 {
    static String text;
    public static void main(String[] args) throws Exception {
        int threads = Integer.parseInt(args[0]);
        int rowsPerThread = Integer.parseInt(args[1]);
        String mode = args[2];
        StringBuilder sb = new StringBuilder();
        for (int i = 0; i < 8; i++) sb.append("lorem ipsum dolor sit amet consectetur ");
        text = sb.toString();
        final Pattern shared = Pattern.compile("[^a-zA-Z0-9]+");
        Runnable warm = () -> { for (int i = 0; i < 20000; i++) work(mode, shared, i); };
        warm.run();
        long t0 = System.nanoTime();
        Thread[] ts = new Thread[threads];
        for (int t = 0; t < threads; t++) {
            ts[t] = new Thread(() -> {
                for (int i = 0; i < rowsPerThread; i++) work(mode, shared, i);
            });
            ts[t].start();
        }
        for (Thread th : ts) th.join();
        double sec = (System.nanoTime() - t0) / 1e9;
        long totalRows = (long) threads * rowsPerThread;
        System.out.printf("mode=%s threads=%d wall=%.3f rows/s=%.0f%n",
            mode, threads, sec, totalRows / sec);
    }
    static long work(String mode, Pattern shared, int i) {
        String s = text + i;
        switch (mode) {
            case "compile": return Pattern.compile("[^a-zA-Z0-9]+").split(s, -1).length;
            case "shared":  return shared.split(s, -1).length;
            case "chars": {
                int n = 0; boolean in = false;
                for (int k = 0; k < s.length(); k++) {
                    char c = s.charAt(k);
                    boolean tok = (c>='a'&&c<='z')||(c>='A'&&c<='Z')||(c>='0'&&c<='9');
                    if (tok && !in) n++;
                    in = tok;
                }
                return n;
            }
        }
        return 0;
    }
}
